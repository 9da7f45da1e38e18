"""Centroidal MPC stack: gait, SRB model, condensed-QP ADMM, torque mapping."""

from gym_quadruped_tpu.mpc.centroidal import CentroidalParams
from gym_quadruped_tpu.mpc.controller import CentroidalMPC, MPCConfig
from gym_quadruped_tpu.mpc.gait import GaitConfig
from gym_quadruped_tpu.mpc.qp import MPCWeights

__all__ = ['CentroidalMPC', 'MPCConfig', 'CentroidalParams', 'GaitConfig',
           'MPCWeights']
from gym_quadruped_tpu.mpc.mppi import MPPI, MPPIConfig, velocity_tracking_cost

__all__ += ['MPPI', 'MPPIConfig', 'velocity_tracking_cost']
