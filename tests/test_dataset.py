

def test_task_grouped_batch_sampler():
    """Every batch_size block comes from one sub-dataset; dataset
    frequencies follow the item-weight proportions."""
    import numpy as np

    from lipvq_tpu.data.dataset import TaskGroupedBatchSampler

    boundaries = [0, 100, 300, 600]
    s = TaskGroupedBatchSampler(boundaries, [1.0, 1.0, 1.0],
                                batch_size=16, num_samples=960, seed=0)
    idx = np.asarray(list(iter(s)))
    assert len(idx) == 960
    ds_of = np.searchsorted(boundaries, idx, side="right") - 1
    blocks = ds_of.reshape(-1, 16)
    assert (blocks == blocks[:, :1]).all(), "mixed-task batch found"
    # dataset 2 has 3x the items of dataset 0 -> ~3x the batches
    counts = np.bincount(blocks[:, 0], minlength=3).astype(float)
    assert counts[2] > counts[0] * 1.5
