"""point_cloud_reid_tpu — a TPU-native (JAX/XLA/Pallas/pjit) re-implementation of the
capabilities of bentherien/point-cloud-reid (WACV 2024, "Object Re-identification from
Point Clouds").

Layer map (mirrors reference SURVEY.md §1, rebuilt TPU-first):
  tools/       — CLI entry points (train/test/bench), launchers
  configs/     — dataclass configs, 4-axis composition (dataset x model x schedule x runtime)
  train/       — functional pjit training loop, optax schedules, orbax checkpoints, hooks
  parallel/    — mesh construction + sharding specs (DP batch sharding, pair-dim sharding)
  data/        — crop-store reader, density-bucket pair samplers, synthetic store
  models/      — flax backbones (PointNet/DGCNN/point-transformer/ViT) + ReID match heads
  ops/         — point-cloud ops (kNN/FPS/grouping/interpolation/chamfer/boxes) + Pallas kernels
  evaluation/  — MatchingEval stratified metrics engine
  inference/   — amortized NxN pair-scoring engine (tracking workload)
"""

__version__ = "0.1.0"
