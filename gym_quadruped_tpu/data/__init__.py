"""Dataset adapters over the H5 trajectory store."""

from gym_quadruped_tpu.data.proprioceptive_datasets import ProprioceptiveDataset

__all__ = ['ProprioceptiveDataset']
