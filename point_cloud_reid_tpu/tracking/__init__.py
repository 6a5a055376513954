"""3D multi-object tracking on ReID cost matrices — TPU-native rebuild.

Capability-parity port of the reference's tracking layer
(mmdet3d/models/trackers/deprecated/, SURVEY.md §2.4 L11 / §3.5): the ReID
nets act as pairwise cost-matrix generators at frame rate; a host-side
associator maintains track identity. The split here is TPU-idiomatic:

  device (jit):  crop extraction (crops.py), detection embedding + the full
                 tracks x detections cost matrix in one fused program
                 (inference.PairScorer), bucketed to avoid recompiles.
  host (numpy):  association (greedy / Hungarian), track lifecycle — tiny,
                 branchy, O(T·D) work that would fight the compiler.

Components:
  extract_box_crops      <- pc_utils.interpolate_per_frame + get_input_batch
  TrackStore / Track     <- track.Track (:7-214), virtual_tracker bookkeeping
  associate / gates      <- TrackingAssociator(Max), Center2DRange
                            (virtual_tracker.py:31-44, tracking_association.py)
  TrackingManager        <- tracking_manager.TrackingManager / VirtualTracker
  supervision            <- tracking_supervision.py (focal, margin association)
"""
from .association import associate, center_distance_gate, greedy_assignment
from .crops import extract_box_crops
from .decisions import DecisionModifier, sampling_rate
from .motion import BoxUpdater, LSTMIncrementor, constant_velocity_step
from .image_crops import crops_per_frame, extract_crops, project_boxes
from .manager import TrackingManager
from .supervision import (association_margin_loss, sigmoid_focal_loss,
                          softmax_association_loss)
from .track import Track, TrackStore

__all__ = [
    "associate", "center_distance_gate", "greedy_assignment",
    "extract_box_crops", "crops_per_frame", "extract_crops", "project_boxes",
    "TrackingManager", "Track", "TrackStore",
    "DecisionModifier", "sampling_rate", "BoxUpdater", "LSTMIncrementor",
    "constant_velocity_step",
    "sigmoid_focal_loss", "association_margin_loss",
    "softmax_association_loss",
]
