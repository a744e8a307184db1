"""msmp_pde_tpu — a TPU-native (JAX/XLA/Pallas) framework for multi-scale
message-passing neural PDE solvers.

Re-designed from scratch with the capability surface of Leqr/MSMP-PDE
(reference layer map in SURVEY.md §1):

  * ``ops``       — numerical kernels (FDM / WENO5 stencils, segment ops).
  * ``temporal``  — explicit Runge-Kutta time integration (fixed + adaptive),
                    ETDRK4 spectral stepping.
  * ``equations`` — PDE right-hand sides (CE, WE, AD, KF, KS) as pure functions.
  * ``datagen``   — batched, vmapped dataset generation writing the reference
                    HDF5 schema.
  * ``data``      — HDF5 dataset reader, temporal-bundling window sampler and
                    static-shape graph (neighbor-list) construction.
  * ``models``    — message-passing GNN family (MP-PDE, MSMP-PDE, ...), CNN and
                    FNO baselines, LEM/LSTM temporal encoders.
  * ``training``  — pushforward training loop, rollout metrics, eval.
  * ``parallel``  — device-mesh sharding helpers (data parallelism over
                    trajectories via jax.sharding / shard_map).

Everything on the compute path is jittable with static shapes; neighbor
graphs are dense per-node neighbor lists (no dynamic scatter), so message
passing lowers to batched matmuls + gathers that tile onto the TPU MXU.
"""

__version__ = "0.1.0"
