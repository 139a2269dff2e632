

def test_task_paired_batch_sampler():
    """Context/query halves are task-aligned elementwise; batches mix
    tasks; dataset frequencies follow item-weight proportions."""
    import numpy as np

    from lipvq_tpu.data.dataset import TaskPairedBatchSampler

    boundaries = [0, 100, 300, 600]
    s = TaskPairedBatchSampler(boundaries, [1.0, 1.0, 1.0],
                               batch_size=16, num_samples=4800, seed=0)
    idx = np.asarray(list(iter(s)))
    assert len(idx) == 4800
    ds_of = np.searchsorted(boundaries, idx, side="right") - 1
    batches = ds_of.reshape(-1, 16)
    ctx, qry = batches[:, :8], batches[:, 8:]
    assert (ctx == qry).all(), "ctx/qry halves not task-aligned"
    # batches MIX tasks (single-task batches measurably slow learning)
    mixed = (batches.min(axis=1) != batches.max(axis=1)).mean()
    assert mixed > 0.5
    # dataset 2 has 3x the items of dataset 0 -> ~3x the slots
    counts = np.bincount(ctx.ravel(), minlength=3).astype(float)
    assert 2.0 < counts[2] / counts[0] < 4.5
