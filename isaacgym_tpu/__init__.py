"""isaacgym_tpu — a TPU-native vectorized physics + RL-environment framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of the
IsaacGymEnvs humanoid-pingpong stack (reference: mjmj531/isaacgym; see
SURVEY.md). The simulator is a pure-functional batched rigid-body engine
stepped under one ``jit``; tasks are pure observation/reward/reset functions
fused into the step; training is JAX PPO sharded over a device mesh.

Layer map (bottom-up, mirroring SURVEY.md §1):
  ops/        — physics + math kernels (Featherstone ABA, contacts, PD)
  models/     — asset compiler: URDF/MJCF -> static kinematic-tree arrays
  sim/        — batched simulator core (PhysX-equivalent capability, N1/N2)
  env/        — functional VecTask equivalent (N7)
  tasks/      — the pingpong task family (C5-C11)
  rl/         — PPO actor-critic stack (N9)
  parallel/   — mesh/sharding/collectives (N10)
  utils/      — rotations (N8), config (L6), logging (N11)
"""

__version__ = "0.1.0"

from isaacgym_tpu.make import make  # noqa: F401
