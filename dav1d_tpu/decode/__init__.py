"""Block decode layer: per-tile symbol decoding producing block/coefficient
data, plus frame orchestration (reference L3/L4, src/decode.c)."""

from .frame import FrameContext, decode_frame  # noqa: F401
