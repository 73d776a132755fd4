"""Value codecs — the flumecodec analog (`README.md:103`: the log
delegates encoding to a codec; JSON in the reference's tests).

A codec turns an arbitrary Python value into the log's stored string and
back. The log stays schema-less (SURVEY §1.1: the value is a black box
to the engine; only views interpret it).
"""

from __future__ import annotations

import base64
import json
from typing import Any


class JsonCodec:
    """Default: sorted-key JSON (the reference's `flumecodec/json`)."""

    name = "json"

    def encode(self, value: Any) -> str:
        return json.dumps(value, sort_keys=True, default=str)

    def decode(self, raw: str) -> Any:
        return json.loads(raw)


class RawCodec:
    """Strings stored verbatim (the reference's raw/utf-8 codec)."""

    name = "raw"

    def encode(self, value: Any) -> str:
        if not isinstance(value, str):
            raise TypeError("raw codec stores strings only")
        return value

    def decode(self, raw: str) -> Any:
        return raw


class BinaryCodec:
    """Opaque bytes via base64 — the multimodal envelope for binary
    payloads travelling through the string-typed log column."""

    name = "binary"

    def encode(self, value: Any) -> str:
        if not isinstance(value, (bytes, bytearray)):
            raise TypeError("binary codec stores bytes only")
        return base64.b64encode(bytes(value)).decode("ascii")

    def decode(self, raw: str) -> Any:
        return base64.b64decode(raw)


CODECS = {c.name: c for c in (JsonCodec(), RawCodec(), BinaryCodec())}
