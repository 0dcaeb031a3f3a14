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


def test_shim_defers_to_real_protobuf_on_sys_path(tmp_path):
    """When a real google.protobuf distribution exists anywhere else on
    sys.path, the shim must defer to it even when the shim dir comes
    FIRST (the PYTHONPATH-precedes-site-packages worker case, ADVICE
    r7): importing google.protobuf must yield the real package, and its
    submodules must resolve from the real tree."""
    import os
    import subprocess
    import sys

    real = tmp_path / "site" / "google" / "protobuf"
    real.mkdir(parents=True)
    (tmp_path / "site" / "google" / "__init__.py").write_text(
        "__path__ = __import__('pkgutil').extend_path(__path__, __name__)\n"
    )
    (real / "__init__.py").write_text("__version__ = '9.9.9-real'\n")
    (real / "marker.py").write_text("WHOAMI = 'real'\n")

    shim_dir = os.path.join(
        os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))
        ),
        "delfos_etl_pipeline_spark",
        "_vendor",
        "protobuf_shim",
    )
    child = (
        "import google.protobuf as p, google.protobuf.marker as m;"
        "print(p.__version__, m.WHOAMI)"
    )
    env = {**os.environ, "PYTHONPATH": ""}
    out = subprocess.run(
        [sys.executable, "-c", child],
        capture_output=True,
        text=True,
        env={**env, "PYTHONPATH": shim_dir + os.pathsep + str(tmp_path / "site")},
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout.split() == ["9.9.9-real", "real"]
    # and WITHOUT a real distribution the shim still claims the namespace
    out2 = subprocess.run(
        [sys.executable, "-c", "import google.protobuf as p; print(p.__version__)"],
        capture_output=True,
        text=True,
        env={**env, "PYTHONPATH": shim_dir},
    )
    assert out2.returncode == 0, out2.stderr
    assert "minimal-shim" in out2.stdout


def test_shim_duplicate_copy_does_not_recurse(tmp_path):
    """A SECOND copy of the shim itself on sys.path (duplicate checkout,
    inherited PYTHONPATH) must not be mistaken for a real distribution —
    exec'ing another shim copy rescans sys.path from the exec'd module's
    __file__ and recurses to RecursionError (ADVICE r8). The marker is
    the shim-only sibling _runtime.py; with only shim copies visible the
    import must settle on the minimal shim body."""
    import os
    import shutil
    import subprocess
    import sys

    shim_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "delfos_etl_pipeline_spark",
        "_vendor",
        "protobuf_shim",
    )
    copy_dir = tmp_path / "shim_copy"
    shutil.copytree(shim_dir, copy_dir)
    env = {**os.environ, "PYTHONPATH": shim_dir + os.pathsep + str(copy_dir)}
    out = subprocess.run(
        [sys.executable, "-c", "import google.protobuf as p; print(p.__version__)"],
        capture_output=True,
        text=True,
        env=env,
    )
    assert out.returncode == 0, out.stderr[-800:]
    assert "minimal-shim" in out.stdout
    # and with a REAL distribution behind both shim copies, defer to it
    # — and expose the real package's __file__, not the shim shell's.
    real = tmp_path / "site" / "google" / "protobuf"
    real.mkdir(parents=True)
    (tmp_path / "site" / "google" / "__init__.py").write_text(
        "__path__ = __import__('pkgutil').extend_path(__path__, __name__)\n"
    )
    (real / "__init__.py").write_text("__version__ = '9.9.9-real'\n")
    env["PYTHONPATH"] = (
        shim_dir + os.pathsep + str(copy_dir) + os.pathsep + str(tmp_path / "site")
    )
    out2 = subprocess.run(
        [sys.executable, "-c",
         "import google.protobuf as p; print(p.__version__, p.__file__)"],
        capture_output=True,
        text=True,
        env=env,
    )
    assert out2.returncode == 0, out2.stderr[-800:]
    ver, file = out2.stdout.split()
    assert ver == "9.9.9-real"
    assert file.startswith(str(real))


def test_packed_repeated_fixed_width_accepted():
    """Packed wire-type-2 runs of fixed64/fixed32 scalars must decode as
    8/4-byte elements, not crash a whole-run struct.unpack (ADVICE r7)."""
    import struct

    from delfos_etl_pipeline_spark._vendor.protobuf_shim.google.protobuf import (
        _runtime,
    )

    md = _runtime.MessageDescriptor("PF")
    fd = _runtime.FieldDescriptor()
    fd.name, fd.number, fd.label, fd.type = "ds", 1, 3, _runtime.TYPE_DOUBLE
    ff = _runtime.FieldDescriptor()
    ff.name, ff.number, ff.label, ff.type = "fs", 2, 3, _runtime.TYPE_FIXED32
    md.fields = [fd, ff]
    md.finalize()
    cls = _runtime.make_message_class(md, __name__)
    inst = cls()
    packed_d = struct.pack("<2d", 1.5, -2.25)
    packed_f = struct.pack("<3I", 7, 0, 4294967295)
    wire = (
        b"\x0a" + bytes([len(packed_d)]) + packed_d
        + b"\x12" + bytes([len(packed_f)]) + packed_f
    )
    inst.ParseFromString(wire)
    assert list(inst.ds) == [1.5, -2.25]
    assert list(inst.fs) == [7, 0, 4294967295]


def test_singular_submessage_merges_on_repeated_occurrence():
    """Spec: repeated wire occurrences of a NON-repeated message field
    merge field-by-field (last-one-wins applies per SCALAR inside the
    submessage, not to the submessage wholesale) — ADVICE r7."""
    ti1 = sm.TimerInfo(key=b"k")
    ti2 = sm.TimerInfo(timestampMs=42)
    # two occurrences of StateCallCommand.timeoutTimestampMs? use a
    # message-typed field: TimerStateCallCommand has a nested call —
    # simplest spec witness: concatenate two serialized parents each
    # carrying one half of the submessage.
    one = sm.StateResponseWithTimer(timer=[ti1]).SerializeToString()
    # repeated message fields APPEND (spec) — sanity first
    two = sm.StateResponseWithTimer()
    two.ParseFromString(one + sm.StateResponseWithTimer(timer=[ti2]).SerializeToString())
    assert [(t.key, t.timestampMs) for t in two.timer] == [(b"k", 0), (b"", 42)]
    # singular message field: StatefulProcessorCall.timerStateCall twice,
    # first with only stateName-bearing sub-call, then with only the
    # other half — the merged parse must contain BOTH halves.
    a = sm.StatefulProcessorCall(
        getValueState=sm.StateCallCommand(stateName="s")
    ).SerializeToString()
    b = sm.StatefulProcessorCall(
        getValueState=sm.StateCallCommand(schema="i long")
    ).SerializeToString()
    merged = sm.StatefulProcessorCall()
    merged.ParseFromString(a + b)
    assert merged.getValueState.stateName == "s"
    assert merged.getValueState.schema == "i long"
