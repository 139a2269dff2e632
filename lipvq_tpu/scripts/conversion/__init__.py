"""Dataset conversion / compatibility tools.

Counterpart of reference robomimic/scripts/conversion/ (9 scripts) +
copy_ds_key.py — the on-ramp that turns raw robot datasets into the
robomimic HDF5 schema (SURVEY.md A.1) this framework trains on.
"""
