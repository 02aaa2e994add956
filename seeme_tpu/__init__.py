"""seeme-tpu: a TPU-native (JAX/XLA/Pallas/pjit) framework for egocentric social
human mesh/motion estimation, with the capabilities of L-Scofano/SEEME (WACV '25).

Layer map (bottom to top; see SURVEY.md for the reference layer map this mirrors):

  core/       pure geometry primitives + SMPL forward kinematics
  ops/        Pallas TPU kernels for the hot paths
  nn/         transformer / pointnet / resnet / gcn layer library (flax.linen)
  flows/      conditional normalizing-flow bijectors (Glow: ActNorm/LULinear/coupling)
  diffusion/  DDPM/DDIM scheduler numerics + scan-compiled reverse process
  models/     MotionVae, Denoiser, SeeMe system, ProHMR-Scene, EgoHMR branch
  parallel/   device-mesh construction and sharding rules (dp/model axes)
  data/       dataset registry + fixed-shape batch loaders
  train/      train state, optimizer, loop, orbax checkpointing
  eval/       vectorized metrics + replication statistics
  config/     yaml cascade loader (reference-compatible config surface)

Everything on the compute path is pure-functional and jit-compiled; variable
length is handled with static shapes + masks so XLA sees one program.
"""

__version__ = "0.1.0"
