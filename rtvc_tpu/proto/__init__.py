"""Protobuf messages for the gRPC caption service.

``caption_pb2.py`` is generated (and committed — the sandbox has protoc
but tests must not depend on running it) from ``caption.proto``:

    cd rtvc_tpu/proto && protoc --python_out=. caption.proto
"""

from . import caption_pb2  # noqa: F401

__all__ = ["caption_pb2"]
