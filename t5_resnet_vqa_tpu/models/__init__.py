from .cross_attention_vqa import CrossAttentionVitVQAModel
from .faster_rcnn_vqa import FasterRcnnVQAModel
from .fpn import FPN
from .generation import beam_generate, greedy_generate
from .resnet import ResNetBackbone, resnet_out_channels
from .resnet_vqa import ResnetVQAModel
from .roberta import RobertaConfig, RobertaEmbeddings, RobertaLayer
from .t5 import T5Config, T5Decoder, T5Encoder
from .vit import ViTConfig, ViTModel
from .vit_vqa import VitVQAModel

__all__ = [
    "ResNetBackbone", "resnet_out_channels", "FPN",
    "T5Config", "T5Encoder", "T5Decoder",
    "ViTConfig", "ViTModel",
    "RobertaConfig", "RobertaEmbeddings", "RobertaLayer",
    "ResnetVQAModel", "FasterRcnnVQAModel", "VitVQAModel",
    "CrossAttentionVitVQAModel",
    "greedy_generate", "beam_generate",
]
