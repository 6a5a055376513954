"""Model zoo: flax backbones + Siamese ReID heads.

Mirrors the reference's mmdet3d/models capability surface (SURVEY.md §2.4):
  PointNetBackbone            <- pointnet.py (STN3d/STNkd/PointNetEncoder)
  DGCNNBackbone               <- dgcnn_orig.py (EdgeConv stack)
  PointTransformerBackbone    <- backbone_net.py Pointnet_Backbone (PointNet++ SSG
                                 with linear self-attention)
  ReIDNet / ReIDNetCosine     <- ReIDNet.py:112-809 (siamese match training)
  ImageReIDNet + ViT          <- ReIDNet.py:811-1397 (DeiT/BEiT image branch)
  attention_blocks            <- attention.py + pointnet2_utils.py attention zoo
  registry                    <- ReIDNet.py module_obj/build_module mini registry
  vector_neurons              <- trackers/deprecated/vn_layers.py + vn_dgcnn_cls.py
                                 (dead in the reference, live backbone here)
  loftr                       <- trackers/deprecated/loftr.py (dead there, live stage)
  node_pooling                <- trackers/deprecated/node_pooling.py (gated readouts)
"""
from .build import build_model
from .dgcnn import DGCNNBackbone
from .image_reid import ImageReIDNet
from .layers import LinearRes, MLP, PosMLP, pooled_feats
from .loftr import LocalFeatureTransformer, LoFTREncoderLayer, LoFTRStage
from .node_pooling import EdgeGatedPooling, GatedPooling
from .point_transformer import PointTransformerBackbone
from .pointnet import PointNetBackbone, feature_transform_regularizer
from .registry import build_backbone, build_head, build_stage
from .reid_net import ReIDNet, ReIDNetCosine
from .vector_neurons import VNDGCNNBackbone, VNStdFeature
from .vit import ViT, build_vit

__all__ = [
    "build_model", "DGCNNBackbone", "ImageReIDNet", "LinearRes", "MLP",
    "PosMLP", "pooled_feats", "PointTransformerBackbone", "PointNetBackbone",
    "feature_transform_regularizer", "build_backbone", "build_head",
    "build_stage", "ReIDNet", "ReIDNetCosine", "ViT", "build_vit",
    "LocalFeatureTransformer", "LoFTREncoderLayer", "LoFTRStage",
    "EdgeGatedPooling", "GatedPooling", "VNDGCNNBackbone", "VNStdFeature",
]
