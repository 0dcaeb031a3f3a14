"""Vendored minimal-protobuf runtime: wire-format and descriptor tests.

The shim (delfos_etl_pipeline_spark/_vendor/protobuf_shim) must be
SPEC-correct, not merely self-consistent — the JVM parses its bytes with
protobuf-java during transformWithState's state handshake. Golden
vectors below are hand-derived from the public encoding spec
(https://protobuf.dev/programming-guides/encoding/); the end-to-end
proof is tests/test_streaming.py::test_tws_running_totals_matches_batch.
"""

from delfos_etl_pipeline_spark._vendor import ensure_protobuf

ensure_protobuf()

import pyspark.sql.streaming.proto.StateMessage_pb2 as sm  # noqa: E402


def test_golden_wire_bytes():
    """Hand-derived spec encodings (field<<3|wire tags, varints,
    length-delimited payloads)."""
    # StateResponse{statusCode=1}: field 1 varint -> 08 01
    assert sm.StateResponse(statusCode=1).SerializeToString() == b"\x08\x01"
    # proto3 implicit presence: default scalar emits nothing
    assert sm.StateResponse(statusCode=0).SerializeToString() == b""
    # bytes field 3: tag 1a, len 3
    assert (
        sm.StateResponse(value=b"abc").SerializeToString() == b"\x1a\x03abc"
    )
    # nested oneof submessage, empty: StateRequest.statefulProcessorCall
    # (field 2) wrapping SetHandleState(state=INITIALIZED=2):
    # 12 04 | 0a 02 | 08 02
    m = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.INITIALIZED)
        )
    )
    assert m.SerializeToString() == b"\x12\x04\x0a\x02\x08\x02"
    # empty oneof submessage MUST still be emitted (presence): Exists
    # under ValueStateCall field 2 -> 0a 01 76 ("v") 12 00
    vc = sm.ValueStateCall(stateName="v", exists=sm.Exists())
    assert vc.SerializeToString() == b"\x0a\x01v\x12\x00"
    # int64 varint >127: TTLConfig(durationMs=300) -> 08 AC 02
    assert (
        sm.TTLConfig(durationMs=300).SerializeToString() == b"\x08\xac\x02"
    )
    # negative int64 is 10-byte two's-complement varint
    enc = sm.TTLConfig(durationMs=-1).SerializeToString()
    assert enc == b"\x08" + b"\xff" * 9 + b"\x01"
    got = sm.TTLConfig()
    got.ParseFromString(enc)
    assert got.durationMs == -1


def test_repeated_and_bool_roundtrip():
    msg = sm.ListStatePut(value=[b"a", b"bb", b""], fetchWithArrow=True)
    # field 1 x3 (len-delimited), field 2 bool true -> 10 01
    assert (
        msg.SerializeToString()
        == b"\x0a\x01a\x0a\x02bb\x0a\x00\x10\x01"
    )
    back = sm.ListStatePut()
    back.ParseFromString(msg.SerializeToString())
    assert list(back.value) == [b"a", b"bb", b""]
    assert back.fetchWithArrow is True
    # absent repeated reads as empty list; absent bool as False
    empty = sm.ListStatePut()
    assert list(empty.value) == [] and empty.fetchWithArrow is False


def test_repeated_message_and_optional_presence():
    resp = sm.StateResponseWithTimer(
        statusCode=0,
        timer=[
            sm.TimerInfo(key=b"k1", timestampMs=10),
            sm.TimerInfo(timestampMs=20),  # optional key unset
        ],
        requireNextFetch=True,
    )
    back = sm.StateResponseWithTimer()
    back.ParseFromString(resp.SerializeToString())
    assert [(t.key, t.timestampMs) for t in back.timer] == [
        (b"k1", 10),
        (b"", 20),
    ]
    assert back.timer[0].HasField("key") and not back.timer[1].HasField("key")
    assert back.requireNextFetch is True


def test_oneof_last_writer_wins():
    call = sm.ValueStateCall(stateName="s", exists=sm.Exists())
    call.get = sm.Get()  # same oneof: clears exists
    assert call.WhichOneof("method") == "get"
    back = sm.ValueStateCall()
    back.ParseFromString(call.SerializeToString())
    assert back.WhichOneof("method") == "get"
    assert not back.HasField("exists")


def test_unknown_fields_skipped():
    # field 99 varint + field 1 of StateResponse: parser must skip the
    # unknown tag (wire-type-aware) and still read statusCode
    payload = b"\x98\x06\x2a" + b"\x08\x07"
    msg = sm.StateResponse()
    msg.ParseFromString(payload)
    assert msg.statusCode == 7


def test_packed_repeated_scalars_accepted():
    """A conforming proto3 peer may pack repeated varints; the parser
    must accept the packed form even though this proto's repeated fields
    are bytes/messages (guard for future generated protos)."""
    from delfos_etl_pipeline_spark._vendor.protobuf_shim.google.protobuf import (
        _runtime,
    )

    md = _runtime.MessageDescriptor("P")
    f = _runtime.FieldDescriptor()
    f.name, f.number, f.label, f.type = "xs", 1, 3, _runtime.TYPE_INT64
    md.fields = [f]
    md.finalize()
    cls = _runtime.make_message_class(md, __name__)
    inst = cls()
    inst.ParseFromString(b"\x0a\x03\x01\x7f\x05")  # packed [1, 127, 5]
    assert list(inst.xs) == [1, 127, 5]


def test_enum_constants_and_wrapper():
    assert (sm.PRE_INIT, sm.CREATED, sm.INITIALIZED) == (0, 1, 2)
    assert (sm.DATA_PROCESSED, sm.TIMER_PROCESSED, sm.CLOSED) == (3, 4, 5)
    assert sm.HandleState.Value("CLOSED") == 5
    assert sm.HandleState.Name(2) == "INITIALIZED"


def test_descriptor_parse_covers_all_state_messages():
    """Every message the PySpark state clients construct must have
    resolved descriptors with the right field numbers."""
    d = sm.StateRequest.DESCRIPTOR
    assert [f.name for f in d.fields][:2] == ["version", "statefulProcessorCall"]
    assert d.fields_by_name["statefulProcessorCall"].message_type.name == (
        "StatefulProcessorCall"
    )
    for name in (
        "StateResponse", "StateResponseWithLongTypeVal",
        "StateResponseWithStringTypeVal", "StateResponseWithListGet",
        "StateResponseWithMapKeysOrValues", "StateResponseWithMapIterator",
        "StateResponseWithTimer", "StatefulProcessorCall",
        "StateVariableRequest", "ImplicitGroupingKeyRequest",
        "TimerRequest", "UtilsRequest", "StateCallCommand",
        "ValueStateCall", "ListStateCall", "MapStateCall",
        "SetImplicitKey", "ValueStateUpdate", "ListStatePut",
        "AppendValue", "AppendList", "GetValue", "ContainsKey",
        "UpdateValue", "Iterator", "Keys", "Values", "RemoveKey",
        "SetHandleState", "TTLConfig", "TimerInfo", "KeyAndValuePair",
    ):
        assert hasattr(sm, name), name
