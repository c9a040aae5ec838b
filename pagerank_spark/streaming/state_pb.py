"""Pure-Python, wire-compatible stand-in for PySpark's generated
``pyspark.sql.streaming.proto.StateMessage_pb2``.

Spark 4's ``transformWithStateInPandas`` Python worker speaks a
protobuf protocol to the JVM state server, and the generated module
requires the ``google.protobuf`` runtime — which this environment does
not ship. The message schema is small (~40 flat messages, scalar +
bytes + singular/repeated sub-message fields, one enum), so this
module re-implements exactly those messages with hand-rolled proto3
wire-format encode/decode: varint scalars, length-delimited
strings/bytes/sub-messages, explicit presence for oneof members and
``optional`` fields, implicit presence (default-skipping) for plain
proto3 scalars.

The schema is transcribed from Apache Spark's public
``StateMessage.proto`` (sql/core/src/main/protobuf/org/apache/spark/
sql/execution/streaming/StateMessage.proto, as embedded in the
generated module's serialized FileDescriptorProto). Only the behaviors
the PySpark state clients use are implemented:

- construction via keyword arguments,
- scalar attribute assignment (``cmd.stateName = ...``),
- sub-message auto-vivification with attach-on-write semantics
  (``cmd.ttl.durationMs = 5`` marks ``ttl`` present; merely READING
  ``cmd.ttl`` does not — presence drives the JVM's hasTtl checks),
- ``SerializeToString`` / ``ParseFromString`` / ``HasField``,
- repeated bytes / repeated message fields as plain lists.

``pagerank_spark.streaming.stateful2`` installs this module under the
generated module's import name (driver AND worker: the worker unpickles
the user's StatefulProcessor — importing that module — before the state
client's first lazy pb2 import). When the real ``google.protobuf``
runtime is present the shim is not installed.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# proto3 wire format primitives

_WT_VARINT = 0
_WT_I64 = 1
_WT_LEN = 2
_WT_I32 = 5

_U64 = 1 << 64


def _enc_varint(out: bytearray, v: int) -> None:
    v &= _U64 - 1  # negatives as 64-bit two's complement (10-byte form)
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _enc_tag(out: bytearray, number: int, wt: int) -> None:
    _enc_varint(out, (number << 3) | wt)


def _enc_len(out: bytearray, number: int, payload: bytes) -> None:
    _enc_tag(out, number, _WT_LEN)
    _enc_varint(out, len(payload))
    out.extend(payload)


def _dec_varint(buf: bytes, i: int) -> tuple[int, int]:
    x = 0
    s = 0
    while True:
        c = buf[i]
        i += 1
        x |= (c & 0x7F) << s
        if not c & 0x80:
            return x, i
        s += 7
        if s > 70:
            raise ValueError("malformed varint")


def _signed64(v: int) -> int:
    return v - _U64 if v >= (1 << 63) else v


# ---------------------------------------------------------------------------
# Tiny message framework

# kinds: int32 int64 bool enum string bytes msg
_VARINT_KINDS = frozenset({"int32", "int64", "bool", "enum"})
_DEFAULTS = {"int32": 0, "int64": 0, "bool": False, "enum": 0, "string": "", "bytes": b""}


class _FieldSpec:
    __slots__ = ("name", "number", "kind", "msg", "repeated", "explicit", "oneof")

    def __init__(self, name, number, kind, msg=None, repeated=False, explicit=False, oneof=None):
        self.name = name
        self.number = number
        self.kind = kind
        self.msg = msg  # message class name, resolved lazily via _CLASSES
        self.repeated = repeated
        # explicit presence: oneof members and `optional` proto3 fields
        # serialize whenever set (even to the default value)
        self.explicit = explicit or oneof is not None
        self.oneof = oneof


_CLASSES: dict[str, type] = {}


class Message:
    """Base for all StateMessage messages (see _FieldSpec semantics)."""

    _FIELDS: dict[str, _FieldSpec] = {}
    _BY_NUMBER: dict[int, _FieldSpec] = {}

    def __init__(self, **kwargs):
        object.__setattr__(self, "_values", {})
        object.__setattr__(self, "_parent", None)  # (parent_msg, field_name)
        for k, v in kwargs.items():
            if v is None:
                continue
            setattr(self, k, v)

    # -- presence plumbing ---------------------------------------------------
    def _attach_to_parent(self) -> None:
        parent = self._parent
        if parent is not None:
            object.__setattr__(self, "_parent", None)
            pmsg, fname = parent
            pmsg._set_field(fname, self)

    def _set_field(self, name: str, value) -> None:
        spec = self._FIELDS[name]
        if spec.oneof is not None:
            for other in self._FIELDS.values():
                if other.oneof == spec.oneof and other.name != name:
                    self._values.pop(other.name, None)
        self._values[name] = value
        self._attach_to_parent()

    def __setattr__(self, name, value):
        spec = self._FIELDS.get(name)
        if spec is None:
            raise AttributeError(f"{type(self).__name__} has no field {name!r}")
        if spec.repeated:
            value = list(value)
        elif spec.kind == "string" and not isinstance(value, str):
            raise TypeError(f"{name} expects str")
        elif spec.kind == "bytes" and not isinstance(value, (bytes, bytearray)):
            raise TypeError(f"{name} expects bytes")
        elif spec.kind in ("int32", "int64", "enum"):
            value = int(value)
        elif spec.kind == "bool":
            value = bool(value)
        self._set_field(name, value)

    def __getattr__(self, name):
        # only called when normal lookup fails (all fields live in _values)
        spec = self._FIELDS.get(name)
        if spec is None:
            raise AttributeError(f"{type(self).__name__} has no field {name!r}")
        values = self._values
        if name in values:
            return values[name]
        if spec.repeated:
            lst: list = []
            values[name] = lst  # empty list serializes to nothing
            return lst
        if spec.kind == "msg":
            sub = _CLASSES[spec.msg]()
            object.__setattr__(sub, "_parent", (self, name))
            return sub
        return _DEFAULTS[spec.kind]

    def HasField(self, name: str) -> bool:
        if name not in self._FIELDS:
            raise ValueError(f"unknown field {name!r}")
        return name in self._values

    def WhichOneof(self, oneof: str):
        for spec in self._FIELDS.values():
            if spec.oneof == oneof and spec.name in self._values:
                return spec.name
        return None

    def CopyFrom(self, other: "Message") -> None:
        self._values.clear()
        self.MergeFromString(other.SerializeToString())

    # -- wire format ---------------------------------------------------------
    def SerializeToString(self) -> bytes:
        out = bytearray()
        for spec in sorted(self._FIELDS.values(), key=lambda s: s.number):
            if spec.name not in self._values:
                continue
            v = self._values[spec.name]
            items = v if spec.repeated else [v]
            for item in items:
                if spec.kind == "msg":
                    _enc_len(out, spec.number, item.SerializeToString())
                elif spec.kind == "string":
                    _enc_len(out, spec.number, item.encode("utf-8"))
                elif spec.kind == "bytes":
                    _enc_len(out, spec.number, bytes(item))
                else:  # varint family
                    iv = int(item)
                    if not spec.explicit and not spec.repeated and iv == 0:
                        continue  # implicit presence skips defaults
                    _enc_tag(out, spec.number, _WT_VARINT)
                    _enc_varint(out, iv)
        return bytes(out)

    def ParseFromString(self, data: bytes) -> int:
        self._values.clear()
        return self.MergeFromString(data)

    def MergeFromString(self, data: bytes) -> int:
        buf = bytes(data)
        i = 0
        n = len(buf)
        values = self._values
        while i < n:
            tag, i = _dec_varint(buf, i)
            number, wt = tag >> 3, tag & 7
            spec = self._BY_NUMBER.get(number)
            if wt == _WT_VARINT:
                raw, i = _dec_varint(buf, i)
                if spec is None:
                    continue
                if spec.kind == "bool":
                    v = bool(raw)
                elif spec.kind == "enum":
                    v = raw
                else:
                    v = _signed64(raw)
            elif wt == _WT_LEN:
                ln, i = _dec_varint(buf, i)
                payload = buf[i : i + ln]
                i += ln
                if spec is None:
                    continue
                if spec.kind == "msg":
                    v = _CLASSES[spec.msg]()
                    v.MergeFromString(payload)
                elif spec.kind == "string":
                    v = payload.decode("utf-8")
                elif spec.kind == "bytes":
                    v = payload
                else:  # packed repeated varints (server never sends these here)
                    j = 0
                    while j < len(payload):
                        pv, j = _dec_varint(payload, j)
                        values.setdefault(spec.name, []).append(_signed64(pv))
                    continue
            elif wt == _WT_I64:
                (v,) = struct.unpack_from("<q", buf, i)
                i += 8
                if spec is None:
                    continue
            elif wt == _WT_I32:
                (v,) = struct.unpack_from("<i", buf, i)
                i += 4
                if spec is None:
                    continue
            else:
                raise ValueError(f"unsupported wire type {wt}")
            if spec.repeated:
                values.setdefault(spec.name, []).append(v)
            else:
                self._set_field(spec.name, v) if spec.oneof else values.__setitem__(spec.name, v)
        return len(buf)

    def __repr__(self):
        inner = ", ".join(f"{k}={v!r}" for k, v in self._values.items())
        return f"{type(self).__name__}({inner})"


def _message(name: str, *fields) -> type:
    specs = {f[0]: _FieldSpec(*f[:3], **(f[3] if len(f) > 3 else {})) for f in fields}
    cls = type(
        name,
        (Message,),
        {
            "_FIELDS": specs,
            "_BY_NUMBER": {s.number: s for s in specs.values()},
            "__slots__": (),
        },
    )
    _CLASSES[name] = cls
    return cls


# ---------------------------------------------------------------------------
# Schema: org.apache.spark.sql.execution.streaming.state.StateMessage

# enum HandleState
PRE_INIT = 0
CREATED = 1
INITIALIZED = 2
DATA_PROCESSED = 3
TIMER_PROCESSED = 4
CLOSED = 5

_M = _message
SetHandleState = _M("SetHandleState", ("state", 1, "enum"))
TTLConfig = _M("TTLConfig", ("durationMs", 1, "int64"))
StateCallCommand = _M(
    "StateCallCommand",
    ("stateName", 1, "string"),
    ("schema", 2, "string"),
    ("mapStateValueSchema", 3, "string"),
    ("ttl", 4, "msg", {"msg": "TTLConfig"}),
)
RegisterTimer = _M("RegisterTimer", ("expiryTimestampMs", 1, "int64"))
DeleteTimer = _M("DeleteTimer", ("expiryTimestampMs", 1, "int64"))
ListTimers = _M("ListTimers", ("iteratorId", 1, "string"))
TimerStateCallCommand = _M(
    "TimerStateCallCommand",
    ("register", 1, "msg", {"msg": "RegisterTimer", "oneof": "method"}),
    ("delete", 2, "msg", {"msg": "DeleteTimer", "oneof": "method"}),
    ("list", 3, "msg", {"msg": "ListTimers", "oneof": "method"}),
)
StatefulProcessorCall = _M(
    "StatefulProcessorCall",
    ("setHandleState", 1, "msg", {"msg": "SetHandleState", "oneof": "method"}),
    ("getValueState", 2, "msg", {"msg": "StateCallCommand", "oneof": "method"}),
    ("getListState", 3, "msg", {"msg": "StateCallCommand", "oneof": "method"}),
    ("getMapState", 4, "msg", {"msg": "StateCallCommand", "oneof": "method"}),
    ("timerStateCall", 5, "msg", {"msg": "TimerStateCallCommand", "oneof": "method"}),
    ("deleteIfExists", 6, "msg", {"msg": "StateCallCommand", "oneof": "method"}),
)
Exists = _M("Exists")
Get = _M("Get")
ValueStateUpdate = _M("ValueStateUpdate", ("value", 1, "bytes"))
Clear = _M("Clear")
ValueStateCall = _M(
    "ValueStateCall",
    ("stateName", 1, "string"),
    ("exists", 2, "msg", {"msg": "Exists", "oneof": "method"}),
    ("get", 3, "msg", {"msg": "Get", "oneof": "method"}),
    ("valueStateUpdate", 4, "msg", {"msg": "ValueStateUpdate", "oneof": "method"}),
    ("clear", 5, "msg", {"msg": "Clear", "oneof": "method"}),
)
ListStateGet = _M("ListStateGet", ("iteratorId", 1, "string"))
ListStatePut = _M(
    "ListStatePut",
    ("value", 1, "bytes", {"repeated": True}),
    ("fetchWithArrow", 2, "bool"),
)
AppendValue = _M("AppendValue", ("value", 1, "bytes"))
AppendList = _M(
    "AppendList",
    ("value", 1, "bytes", {"repeated": True}),
    ("fetchWithArrow", 2, "bool"),
)
ListStateCall = _M(
    "ListStateCall",
    ("stateName", 1, "string"),
    ("exists", 2, "msg", {"msg": "Exists", "oneof": "method"}),
    ("listStateGet", 3, "msg", {"msg": "ListStateGet", "oneof": "method"}),
    ("listStatePut", 4, "msg", {"msg": "ListStatePut", "oneof": "method"}),
    ("appendValue", 5, "msg", {"msg": "AppendValue", "oneof": "method"}),
    ("appendList", 6, "msg", {"msg": "AppendList", "oneof": "method"}),
    ("clear", 7, "msg", {"msg": "Clear", "oneof": "method"}),
)
GetValue = _M("GetValue", ("userKey", 1, "bytes"))
ContainsKey = _M("ContainsKey", ("userKey", 1, "bytes"))
UpdateValue = _M("UpdateValue", ("userKey", 1, "bytes"), ("value", 2, "bytes"))
Iterator = _M("Iterator", ("iteratorId", 1, "string"))
Keys = _M("Keys", ("iteratorId", 1, "string"))
Values = _M("Values", ("iteratorId", 1, "string"))
RemoveKey = _M("RemoveKey", ("userKey", 1, "bytes"))
MapStateCall = _M(
    "MapStateCall",
    ("stateName", 1, "string"),
    ("exists", 2, "msg", {"msg": "Exists", "oneof": "method"}),
    ("getValue", 3, "msg", {"msg": "GetValue", "oneof": "method"}),
    ("containsKey", 4, "msg", {"msg": "ContainsKey", "oneof": "method"}),
    ("updateValue", 5, "msg", {"msg": "UpdateValue", "oneof": "method"}),
    ("iterator", 6, "msg", {"msg": "Iterator", "oneof": "method"}),
    ("keys", 7, "msg", {"msg": "Keys", "oneof": "method"}),
    ("values", 8, "msg", {"msg": "Values", "oneof": "method"}),
    ("removeKey", 9, "msg", {"msg": "RemoveKey", "oneof": "method"}),
    ("clear", 10, "msg", {"msg": "Clear", "oneof": "method"}),
)
StateVariableRequest = _M(
    "StateVariableRequest",
    ("valueStateCall", 1, "msg", {"msg": "ValueStateCall", "oneof": "method"}),
    ("listStateCall", 2, "msg", {"msg": "ListStateCall", "oneof": "method"}),
    ("mapStateCall", 3, "msg", {"msg": "MapStateCall", "oneof": "method"}),
)
SetImplicitKey = _M("SetImplicitKey", ("key", 1, "bytes"))
RemoveImplicitKey = _M("RemoveImplicitKey")
ImplicitGroupingKeyRequest = _M(
    "ImplicitGroupingKeyRequest",
    ("setImplicitKey", 1, "msg", {"msg": "SetImplicitKey", "oneof": "method"}),
    ("removeImplicitKey", 2, "msg", {"msg": "RemoveImplicitKey", "oneof": "method"}),
)
GetProcessingTime = _M("GetProcessingTime")
GetWatermark = _M("GetWatermark")
TimerValueRequest = _M(
    "TimerValueRequest",
    ("getProcessingTimer", 1, "msg", {"msg": "GetProcessingTime", "oneof": "method"}),
    ("getWatermark", 2, "msg", {"msg": "GetWatermark", "oneof": "method"}),
)
ExpiryTimerRequest = _M(
    "ExpiryTimerRequest",
    ("iteratorId", 1, "string"),
    ("expiryTimestampMs", 2, "int64"),
)
TimerRequest = _M(
    "TimerRequest",
    ("timerValueRequest", 1, "msg", {"msg": "TimerValueRequest", "oneof": "method"}),
    ("expiryTimerRequest", 2, "msg", {"msg": "ExpiryTimerRequest", "oneof": "method"}),
)
ParseStringSchema = _M("ParseStringSchema", ("schema", 1, "string"))
UtilsRequest = _M(
    "UtilsRequest",
    ("parseStringSchema", 1, "msg", {"msg": "ParseStringSchema", "oneof": "method"}),
)
StateRequest = _M(
    "StateRequest",
    ("version", 1, "int32"),
    ("statefulProcessorCall", 2, "msg", {"msg": "StatefulProcessorCall", "oneof": "method"}),
    ("stateVariableRequest", 3, "msg", {"msg": "StateVariableRequest", "oneof": "method"}),
    ("implicitGroupingKeyRequest", 4, "msg", {"msg": "ImplicitGroupingKeyRequest", "oneof": "method"}),
    ("timerRequest", 5, "msg", {"msg": "TimerRequest", "oneof": "method"}),
    ("utilsRequest", 6, "msg", {"msg": "UtilsRequest", "oneof": "method"}),
)
StateResponse = _M(
    "StateResponse",
    ("statusCode", 1, "int32"),
    ("errorMessage", 2, "string"),
    ("value", 3, "bytes"),
)
StateResponseWithLongTypeVal = _M(
    "StateResponseWithLongTypeVal",
    ("statusCode", 1, "int32"),
    ("errorMessage", 2, "string"),
    ("value", 3, "int64"),
)
StateResponseWithStringTypeVal = _M(
    "StateResponseWithStringTypeVal",
    ("statusCode", 1, "int32"),
    ("errorMessage", 2, "string"),
    ("value", 3, "string"),
)
StateResponseWithListGet = _M(
    "StateResponseWithListGet",
    ("statusCode", 1, "int32"),
    ("errorMessage", 2, "string"),
    ("value", 3, "bytes", {"repeated": True}),
    ("requireNextFetch", 4, "bool"),
)
StateResponseWithMapKeysOrValues = _M(
    "StateResponseWithMapKeysOrValues",
    ("statusCode", 1, "int32"),
    ("errorMessage", 2, "string"),
    ("value", 3, "bytes", {"repeated": True}),
    ("requireNextFetch", 4, "bool"),
)
KeyAndValuePair = _M("KeyAndValuePair", ("key", 1, "bytes"), ("value", 2, "bytes"))
StateResponseWithMapIterator = _M(
    "StateResponseWithMapIterator",
    ("statusCode", 1, "int32"),
    ("errorMessage", 2, "string"),
    ("kvPair", 3, "msg", {"msg": "KeyAndValuePair", "repeated": True}),
    ("requireNextFetch", 4, "bool"),
)
TimerInfo = _M(
    "TimerInfo",
    ("key", 1, "bytes", {"explicit": True}),  # proto3 `optional`
    ("timestampMs", 2, "int64"),
)
StateResponseWithTimer = _M(
    "StateResponseWithTimer",
    ("statusCode", 1, "int32"),
    ("errorMessage", 2, "string"),
    ("timer", 3, "msg", {"msg": "TimerInfo", "repeated": True}),
    ("requireNextFetch", 4, "bool"),
)


def install() -> bool:
    """Install this module as ``StateMessage_pb2`` if (and only if) the
    real ``google.protobuf`` runtime is unavailable. Idempotent.
    Returns True when the typed-state protocol is usable (either via
    the real runtime or this shim)."""
    import sys

    target = "pyspark.sql.streaming.proto.StateMessage_pb2"
    try:
        # Probe the symbol the generated module actually needs, not the
        # bare package: jars on the worker PYTHONPATH (e.g. spark-core)
        # expose an EMPTY `google/protobuf` namespace package from their
        # shaded Java classes, making `import google.protobuf` succeed
        # while the Python runtime is absent.
        from google.protobuf import descriptor  # noqa: F401

        return True  # real runtime present; generated module wins
    except ImportError:
        pass
    if sys.modules.get(target) is None or sys.modules.get(target) is not sys.modules[__name__]:
        sys.modules[target] = sys.modules[__name__]
        try:  # `import a.b.c as x` resolves via the parent's attribute
            import pyspark.sql.streaming.proto as _proto_pkg

            _proto_pkg.StateMessage_pb2 = sys.modules[__name__]
        except ImportError:  # pragma: no cover - no pyspark at all
            return False
    return True
