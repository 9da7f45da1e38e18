"""Data I/O: HDF5 trajectory store (reference-compatible schema)."""

from gym_quadruped_tpu.utils.data.h5 import (
    H5Reader,
    H5Writer,
    load_dict_from_h5,
    save_dict_to_h5,
)

__all__ = ['H5Writer', 'H5Reader', 'save_dict_to_h5', 'load_dict_from_h5']
