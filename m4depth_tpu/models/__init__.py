from m4depth_tpu.models.m4depth import M4Depth, LevelState, init_state
from m4depth_tpu.models.encoder import Encoder, DomainNorm
from m4depth_tpu.models.decoder import DecoderLevel, DispRefiner

__all__ = [
    "M4Depth",
    "LevelState",
    "init_state",
    "Encoder",
    "DomainNorm",
    "DecoderLevel",
    "DispRefiner",
]
