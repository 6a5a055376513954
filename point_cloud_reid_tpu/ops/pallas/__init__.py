"""Pallas TPU kernels for the hot point-cloud ops.

These are the TPU-native analogues of the reference's CUDA extensions
(reference: mmdet3d/ops/knn/src/knn_cuda.cu, ops/furthest_point_sample/src/
furthest_point_sample_cuda.cu) and of the linear-attention inner loop
(mmdet3d/models/pointnet2_utils.py:14-47). Each kernel fuses what the XLA
path materializes in HBM:

  knn            — pairwise square distance + iterative k-argmin entirely in
                   VMEM; never writes the (S, N) distance matrix to HBM.
  fps            — sequential farthest-point selection with the running
                   min-distance buffer held in VMEM scratch.
  linear_attention — elu+1 feature map + KV summary + normalizer + output in
                   one VMEM-resident program per batch row.

All kernels run in interpreter mode automatically off-TPU so the same tests
cover CPU CI and real hardware. Selection order of knn matches the
reference's stable argsort (first occurrence wins on ties), which matters
for checkpoint parity with resampled-duplicate points (SURVEY.md §7).
"""
from .knn import knn_pallas
from .fps import fps_pallas
from .linear_attention import linear_attention_pallas

__all__ = ["knn_pallas", "fps_pallas", "linear_attention_pallas"]
