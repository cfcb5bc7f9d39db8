"""Unit tests for the vendored protobuf shim (masd_spark/vendor/pbshim).

The shim's real integration check is test_streaming.py::
test_transform_with_state_heavy_hitters — the JVM state server parses
the shim's bytes with real protobuf. These tests pin the wire format
against hand-computed byte strings (from the public proto3 spec) and the
message semantics the PySpark state clients rely on.

No SparkSession needed.
"""

from __future__ import annotations

import pytest

from masd_spark.vendor import ensure_protobuf

ensure_protobuf()

sm = pytest.importorskip("pyspark.sql.streaming.proto.StateMessage_pb2")


def test_hand_computed_bytes_scalar_and_oneof():
    # SetImplicitKey.key is field 1, bytes -> tag 0x0a, len, payload
    assert sm.SetImplicitKey(key=b"k").SerializeToString() == b"\x0a\x01k"
    # StateRequest.statefulProcessorCall is field 2 (len-delim) wrapping
    # SetHandleState (field 1) wrapping enum state=CREATED(1) at field 1.
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.CREATED)
        )
    )
    assert req.SerializeToString() == bytes.fromhex("12040a020801")


def test_proto3_default_scalars_are_omitted():
    # fetchWithArrow=False is the default -> zero bytes on the wire beyond
    # the repeated values.
    put = sm.ListStatePut(value=[b"a"], fetchWithArrow=False)
    assert put.SerializeToString() == b"\x0a\x01a"
    # but a set oneof member serializes even when empty (arm selection)
    call = sm.ListStateCall(stateName="s", exists=sm.Exists())
    raw = call.SerializeToString()
    parsed = sm.ListStateCall()
    parsed.ParseFromString(raw)
    assert parsed.WhichOneof("method") == "exists"
    assert parsed.stateName == "s"


def test_oneof_set_clears_siblings():
    call = sm.ValueStateCall(stateName="v", exists=sm.Exists())
    assert call.WhichOneof("method") == "exists"
    call2 = sm.ValueStateCall(stateName="v", get=sm.Get())
    assert call2.WhichOneof("method") == "get"
    # mutating through a kwargs-free path
    c = sm.ValueStateCall()
    c.stateName = "x"
    assert c.WhichOneof("method") is None


def test_nested_autovivify_presence():
    cmd = sm.StateCallCommand()
    cmd.stateName = "st"
    # bare read must NOT mark the submessage present
    assert cmd.ttl.durationMs == 0
    assert not cmd.HasField("ttl")
    # mutation through the auto-vivified child marks it present
    cmd.ttl.durationMs = 1234
    assert cmd.HasField("ttl")
    rt = sm.StateCallCommand()
    rt.ParseFromString(cmd.SerializeToString())
    assert rt.ttl.durationMs == 1234
    assert rt.stateName == "st"


def test_negative_int_ten_byte_varint():
    resp = sm.StateResponse(statusCode=-2)
    raw = resp.SerializeToString()
    # -2 as 64-bit two's complement varint is 10 bytes
    assert raw[0] == 0x08 and len(raw) == 11
    back = sm.StateResponse()
    back.ParseFromString(raw)
    assert back.statusCode == -2


def test_int64_roundtrip_large():
    reg = sm.RegisterTimer(expiryTimestampMs=2**62)
    back = sm.RegisterTimer()
    back.ParseFromString(reg.SerializeToString())
    assert back.expiryTimestampMs == 2**62


def test_repeated_message_response_parse():
    # Simulate a JVM response carrying repeated KeyAndValuePair
    resp = sm.StateResponseWithMapIterator(
        statusCode=0,
        kvPair=[
            sm.KeyAndValuePair(key=b"k1", value=b"v1"),
            sm.KeyAndValuePair(key=b"k2", value=b"v2"),
        ],
        requireNextFetch=True,
    )
    back = sm.StateResponseWithMapIterator()
    back.ParseFromString(resp.SerializeToString())
    assert [(p.key, p.value) for p in back.kvPair] == [
        (b"k1", b"v1"),
        (b"k2", b"v2"),
    ]
    assert back.requireNextFetch is True


def test_repeated_bytes_response_parse():
    resp = sm.StateResponseWithListGet(
        statusCode=0, value=[b"a", b"bb", b""], requireNextFetch=False
    )
    back = sm.StateResponseWithListGet()
    back.ParseFromString(resp.SerializeToString())
    assert list(back.value) == [b"a", b"bb", b""]


def test_unknown_fields_skipped():
    # append an unknown field (number 15, varint) to a valid message
    raw = sm.StateResponse(statusCode=7).SerializeToString() + b"\x78\x2a"
    back = sm.StateResponse()
    back.ParseFromString(raw)
    assert back.statusCode == 7


def test_optional_bytes_timer_info():
    # TimerInfo.key is proto3-optional (synthetic oneof): present-empty is
    # distinguishable from absent.
    ti = sm.TimerInfo(key=b"", timestampMs=99)
    back = sm.TimerInfo()
    back.ParseFromString(ti.SerializeToString())
    assert back.HasField("key")
    assert back.key == b""
    ti2 = sm.TimerInfo(timestampMs=5)
    back2 = sm.TimerInfo()
    back2.ParseFromString(ti2.SerializeToString())
    assert not back2.HasField("key")


def test_enum_wrapper_and_module_constants():
    assert sm.PRE_INIT == 0
    assert sm.CLOSED == 5
    assert sm.HandleState.Name(1) == "CREATED"
    assert sm.HandleState.Value("TIMER_PROCESSED") == 4


def test_unknown_kwarg_and_attr_rejected():
    with pytest.raises(ValueError):
        sm.StateResponse(nope=1)
    resp = sm.StateResponse()
    with pytest.raises(AttributeError):
        resp.nope = 1


def test_parse_string_schema_request_shape():
    # the exact message _parse_string_schema builds
    req = sm.StateRequest(
        utilsRequest=sm.UtilsRequest(
            parseStringSchema=sm.ParseStringSchema(schema="value int")
        )
    )
    back = sm.StateRequest()
    back.ParseFromString(req.SerializeToString())
    assert back.WhichOneof("method") == "utilsRequest"
    assert back.utilsRequest.parseStringSchema.schema == "value int"


def test_shim_never_shadows_real_protobuf():
    # ensure_protobuf reports shim-active only when google.protobuf
    # resolves inside the vendored directory.
    import google.protobuf

    active = ensure_protobuf()
    assert active == ("pbshim" in google.protobuf.__file__)
