"""gym_quadruped_tpu — TPU-native quadruped simulation + MPC framework.

The capabilities of iit-DLSLab/gym-quadruped redesigned for JAX/XLA/Pallas:
batched physics (the MuJoCo role, rebuilt with oracle parity), the same env /
sensor / terrain / dataset surface, and a centroidal + sampling MPC stack that
fans out over device meshes. See README.md and SURVEY.md.

Lazy imports keep `import gym_quadruped_tpu` light; grab submodules directly:

    from gym_quadruped_tpu.env import QuadrupedEnv, ALL_OBS
    from gym_quadruped_tpu.models.builder import load_model
    from gym_quadruped_tpu.mpc import CentroidalMPC, MPPI
"""

__version__ = '0.1.0'

__all__ = ['env', 'models', 'physics', 'sensors', 'mpc', 'parallel', 'ops',
           'terrain', 'data', 'utils']
