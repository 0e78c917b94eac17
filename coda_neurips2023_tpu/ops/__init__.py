"""Device-side geometry & point-cloud ops (XLA + Pallas).

TPU-native replacements for the reference's native components:
  * third_party_pointnet2 CUDA ops  -> sampling.py / grouping.py / interpolate.py
  * utils/box_intersection.pyx      -> giou.py (vectorized Sutherland-Hodgman)
  * scipy linear_sum_assignment     -> hungarian.py (on-device JV algorithm)
  * torchvision / numpy NMS         -> nms.py
"""

from coda_neurips2023_tpu.ops.sampling import furthest_point_sample, gather_points
from coda_neurips2023_tpu.ops.grouping import ball_query, group_points, query_and_group
from coda_neurips2023_tpu.ops.interpolate import three_nn, three_interpolate
from coda_neurips2023_tpu.ops import box_ops
from coda_neurips2023_tpu.ops.giou import generalized_box3d_iou
from coda_neurips2023_tpu.ops.hungarian import hungarian_match
