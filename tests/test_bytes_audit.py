"""The 3.0x physics case rests on scripts/bytes_audit.py — pin the HLO
byte parsing (incl. the Pallas-inclusive correction for custom calls,
which XLA's own cost analysis scores as zero bytes) and the stream
bandwidth measurement plumbing."""

import importlib.util
import os
import sys

spec = importlib.util.spec_from_file_location(
    "bytes_audit",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "bytes_audit.py"),
)
ba = importlib.util.module_from_spec(spec)
sys.modules["bytes_audit"] = ba
spec.loader.exec_module(ba)


_HLO = """\
%fused_computation.1 (param_0.1: bf16[32,88,88,96]) -> bf16[32,88,88,96] {
  %param_0.1 = bf16[32,88,88,96] parameter(0)
  ROOT %mult.9 = bf16[32,88,88,96] multiply(%param_0.1, %param_0.1)
}

ENTRY %main (p0: bf16[32,88,88,96], p1: bf16[96,288]) -> bf16[32,88,88,96] {
  %p0 = bf16[32,88,88,96] parameter(0)
  %p1 = bf16[96,288] parameter(1)
  %fusion.1 = bf16[32,88,88,96] fusion(%p0), kind=kLoop, calls=%fused_computation.1
  %custom-call.7 = bf16[32,88,88,96] custom-call(%fusion.1, %p1), custom_call_target="tpu_custom_call"
  ROOT %copy.3 = bf16[32,88,88,96] copy(%custom-call.7)
}
"""

_ACT = 32 * 88 * 88 * 96 * 2  # bf16
_W = 96 * 288 * 2


def test_shape_bytes_scalar_and_tuple():
    assert ba.shape_bytes("bf16[32,88,88,96]") == _ACT
    assert ba.shape_bytes("(f32[8,4], bf16[2,2])") == 8 * 4 * 4 + 2 * 2 * 2
    assert ba.shape_bytes("pred[]") == 1  # 0-d: dims empty -> 1 elem


def test_pallas_io_bytes_counts_operands_and_output():
    # the custom call reads the fusion output + the weight and writes one
    # activation: 2*ACT + W. The fusion-body multiply must NOT count.
    assert ba.pallas_io_bytes(_HLO) == 2 * _ACT + _W


def test_attribute_writes_skips_fusion_bodies_and_params():
    cats, top = ba.attribute_writes(_HLO)
    assert cats["elementwise-fusion"] == _ACT      # fusion root only
    assert cats["layout-copy"] == _ACT             # the copy
    assert "pallas-kernel" in cats and cats["pallas-kernel"] == _ACT
    names = [n for _, _, n in top]
    assert "mult.9" not in names                   # fusion body excluded


def test_measure_stream_gbps_runs_small():
    gbps = ba.measure_stream_gbps(repeats=1, n=1 << 20, steps=4)
    assert gbps > 0.1  # any real machine streams >0.1 GB/s
