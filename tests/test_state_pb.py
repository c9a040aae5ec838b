"""Wire-format tests for the pure-Python StateMessage shim.

The shim (pagerank_spark/streaming/state_pb.py) stands in for the
generated StateMessage_pb2 when the google.protobuf runtime is absent;
the end-to-end proof is test_stateful2.py's streaming test (full
protocol against the JVM state server). These tests pin the wire
format and presence semantics in isolation.
"""

from __future__ import annotations

import pytest

from pagerank_spark.streaming import state_pb as pb


def _walk(buf):
    """Independent minimal decoder: [(field, wiretype, value), ...]."""
    out, i = [], 0
    while i < len(buf):
        tag, s = 0, 0
        while True:
            c = buf[i]; i += 1
            tag |= (c & 0x7F) << s
            if not c & 0x80:
                break
            s += 7
        fn, wt = tag >> 3, tag & 7
        if wt == 0:
            v, s = 0, 0
            while True:
                c = buf[i]; i += 1
                v |= (c & 0x7F) << s
                if not c & 0x80:
                    break
                s += 7
        elif wt == 2:
            ln, s = 0, 0
            while True:
                c = buf[i]; i += 1
                ln |= (c & 0x7F) << s
                if not c & 0x80:
                    break
                s += 7
            v = buf[i:i + ln]; i += ln
        else:
            raise AssertionError(f"unexpected wire type {wt}")
        out.append((fn, wt, v))
    return out


def test_nested_request_wire_layout():
    cmd = pb.StateCallCommand()
    cmd.stateName = "n"
    cmd.schema = "s"
    cmd.ttl.durationMs = 5000
    msg = pb.StateRequest(
        statefulProcessorCall=pb.StatefulProcessorCall(getValueState=cmd)
    )
    top = _walk(msg.SerializeToString())
    assert [f for f, _, _ in top] == [2]          # statefulProcessorCall
    call = _walk(top[0][2])
    assert [f for f, _, _ in call] == [2]         # getValueState
    inner = {f: v for f, _, v in _walk(call[0][2])}
    assert inner[1] == b"n" and inner[2] == b"s"
    assert _walk(inner[4]) == [(1, 0, 5000)]      # ttl.durationMs


def test_submessage_attach_on_write_only():
    cmd = pb.StateCallCommand(stateName="x")
    _ = cmd.ttl                      # read must NOT mark ttl present
    assert not cmd.HasField("ttl")
    assert b"\x22" not in cmd.SerializeToString()[:1]  # no field-4 tag
    cmd.ttl.durationMs = 1
    assert cmd.HasField("ttl")


def test_oneof_last_set_wins_and_empty_member_presence():
    call = pb.ValueStateCall(stateName="v", get=pb.Get())
    assert call.WhichOneof("method") == "get"
    # empty oneof member still serializes a presence tag (field 3, len 0)
    assert (3, 2, b"") in _walk(call.SerializeToString())
    call2 = pb.ValueStateCall(stateName="v")
    call2.valueStateUpdate.value = b"x"  # attach flips the oneof
    assert call2.WhichOneof("method") == "valueStateUpdate"


def test_negative_int64_ten_byte_roundtrip():
    m = pb.RegisterTimer(expiryTimestampMs=-5)
    enc = m.SerializeToString()
    (fn, wt, v), = _walk(enc)
    assert v == (1 << 64) - 5        # two's complement varint
    m2 = pb.RegisterTimer()
    m2.ParseFromString(enc)
    assert m2.expiryTimestampMs == -5


def test_response_parse_with_repeated_and_defaults():
    t1 = pb.TimerInfo(); t1.key = b"k1"; t1.timestampMs = 123456789
    t2 = pb.TimerInfo(); t2.timestampMs = 42
    raw = bytearray()
    for t in (t1, t2):
        p = t.SerializeToString()
        raw += bytes([3 << 3 | 2, len(p)]) + p
    raw += bytes([4 << 3 | 0, 1])
    r = pb.StateResponseWithTimer()
    r.ParseFromString(bytes(raw))
    assert r.statusCode == 0 and r.errorMessage == ""   # absent -> defaults
    assert [t.timestampMs for t in r.timer] == [123456789, 42]
    assert r.timer[0].HasField("key") and not r.timer[1].HasField("key")
    assert r.requireNextFetch is True


def test_repeated_bytes_and_unknown_field_skip():
    enc = pb.ListStatePut(value=[b"a", b"bb"]).SerializeToString()
    m = pb.ListStatePut(); m.ParseFromString(enc)
    assert list(m.value) == [b"a", b"bb"]
    # unknown field 15 (varint) must be skipped, known ones kept
    extra = bytes([15 << 3 | 0, 7]) + enc
    m2 = pb.ListStatePut(); m2.ParseFromString(extra)
    assert list(m2.value) == [b"a", b"bb"]


def test_unknown_attribute_rejected():
    with pytest.raises(AttributeError):
        pb.StateCallCommand().nope = 1
    with pytest.raises(AttributeError):
        _ = pb.StateCallCommand().nope


def test_install_is_idempotent_and_effective():
    import sys

    assert pb.install() is True
    target = "pyspark.sql.streaming.proto.StateMessage_pb2"
    mod = sys.modules.get(target)
    try:
        from google.protobuf import descriptor  # noqa: F401
        real = True
    except ImportError:
        real = False
    if not real:
        assert mod is pb
        import pyspark.sql.streaming.proto.StateMessage_pb2 as sm
        assert sm is pb


# ---------------------------------------------------------------------------
# Property fuzz: encode/decode symmetry over randomized messages

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False

if HAVE_HYPOTHESIS:

    i64 = st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1)

    @settings(max_examples=200, deadline=None)
    @given(
        status=st.integers(min_value=-(1 << 31), max_value=(1 << 31) - 1),
        err=st.text(max_size=40),
        vals=st.lists(st.binary(max_size=32), max_size=8),
        more=st.booleans(),
    )
    def test_fuzz_list_response_roundtrip(status, err, vals, more):
        m = pb.StateResponseWithListGet(
            statusCode=status, errorMessage=err, value=vals,
            requireNextFetch=more,
        )
        m2 = pb.StateResponseWithListGet()
        m2.ParseFromString(m.SerializeToString())
        assert m2.statusCode == status
        assert m2.errorMessage == err
        assert list(m2.value) == vals
        assert m2.requireNextFetch is more

    @settings(max_examples=200, deadline=None)
    @given(ts=i64, key=st.one_of(st.none(), st.binary(max_size=16)))
    def test_fuzz_timer_info_roundtrip(ts, key):
        t = pb.TimerInfo()
        t.timestampMs = ts
        if key is not None:
            t.key = key
        t2 = pb.TimerInfo()
        t2.ParseFromString(t.SerializeToString())
        assert t2.timestampMs == ts
        assert t2.HasField("key") == (key is not None)
        if key is not None:
            assert t2.key == key

    @settings(max_examples=100, deadline=None)
    @given(
        name=st.text(max_size=20),
        schema=st.text(max_size=40),
        ttl=st.one_of(st.none(), st.integers(min_value=0, max_value=1 << 40)),
    )
    def test_fuzz_state_call_command_roundtrip(name, schema, ttl):
        c = pb.StateCallCommand()
        c.stateName = name
        c.schema = schema
        if ttl is not None:
            c.ttl.durationMs = ttl
        c2 = pb.StateCallCommand()
        c2.ParseFromString(c.SerializeToString())
        assert c2.stateName == name and c2.schema == schema
        assert c2.HasField("ttl") == (ttl is not None)
        if ttl is not None:
            assert c2.ttl.durationMs == ttl

    @settings(max_examples=100, deadline=None)
    @given(pairs=st.lists(
        st.tuples(st.binary(max_size=16), st.binary(max_size=16)),
        max_size=6,
    ))
    def test_fuzz_map_iterator_roundtrip(pairs):
        m = pb.StateResponseWithMapIterator(
            kvPair=[pb.KeyAndValuePair(key=k, value=v) for k, v in pairs]
        )
        m2 = pb.StateResponseWithMapIterator()
        m2.ParseFromString(m.SerializeToString())
        assert [(p.key, p.value) for p in m2.kvPair] == pairs


def test_real_protobuf_byte_equality_when_available():
    """r9 verdict #8: when the real ``google.protobuf`` runtime (and
    PySpark's generated ``StateMessage_pb2``) is importable, the shim
    must be BYTE-IDENTICAL on the wire for every message shape the
    state clients send, in both directions (serialize here / parse
    there and vice versa). Skips cleanly in environments without the
    runtime — the wire-layout tests above and the end-to-end JVM
    protocol test in test_stateful2.py are the in-env evidence."""
    real = pytest.importorskip(
        "pyspark.sql.streaming.proto.StateMessage_pb2",
        reason="google.protobuf runtime not installed in this env",
    )
    if getattr(real, "__file__", None) == pb.__file__:
        # an earlier test (or stateful2) installed the shim under the
        # generated module's name — that's the shim, not the runtime
        pytest.skip("only the shim is installed under the pb2 name")

    def pair(builder):
        shim_msg = builder(pb)
        real_msg = builder(real)
        s_bytes = shim_msg.SerializeToString()
        r_bytes = real_msg.SerializeToString()
        assert s_bytes == r_bytes, (
            type(shim_msg).__name__, s_bytes.hex(), r_bytes.hex(),
        )
        # cross-parse: the real runtime reads the shim's bytes back to
        # an equal message
        reparsed = type(real_msg)()
        reparsed.ParseFromString(s_bytes)
        assert reparsed == real_msg

    # enum scalar
    pair(lambda m: m.SetHandleState(state=m.INITIALIZED))
    # nested oneof + ttl sub-message presence
    def processor_call(m):
        c = m.StatefulProcessorCall()
        c.getValueState.stateName = "s"
        c.getValueState.schema = "sch"
        c.getValueState.ttl.durationMs = 5000
        return c
    pair(processor_call)
    # bytes payload through a oneof
    def value_update(m):
        c = m.ValueStateCall(stateName="v")
        c.valueStateUpdate.value = b"\x00\x01\xff"
        return c
    pair(value_update)
    # repeated bytes + trailing bool
    pair(lambda m: m.ListStatePut(value=[b"a", b"", b"xyz"],
                                  fetchWithArrow=True))
    # negative int64 (10-byte varint form)
    pair(lambda m: m.RegisterTimer(expiryTimestampMs=-1))
    # empty message inside a oneof (presence without content)
    def exists_call(m):
        c = m.ValueStateCall(stateName="e")
        c.exists.SetInParent() if hasattr(c.exists, "SetInParent") else None
        # assignment-free presence: real proto needs explicit touch
        try:
            c.exists.SetInParent()
        except AttributeError:
            pass
        return c
    pair(exists_call)
