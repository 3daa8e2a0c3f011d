from .tinyvit import TinyViT, tiny_vit_21m_config, TinyViTConfig
from .layers import PositionalEncoding, sinusoidal_position_encoding
from .student import StudentCandidateV1
from .clip_vit import CLIPViT, clip_vit_l14_config
from .git_teacher import GITTeacher, GenerativeImageTextTeacher

__all__ = [
    "TinyViT",
    "TinyViTConfig",
    "tiny_vit_21m_config",
    "PositionalEncoding",
    "sinusoidal_position_encoding",
    "StudentCandidateV1",
    "CLIPViT",
    "clip_vit_l14_config",
    "GITTeacher",
    "GenerativeImageTextTeacher",
]
