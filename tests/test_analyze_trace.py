"""tools/analyze_trace.py gviz-JSON parsing (no profiler, no devices).

xprof's framework_op_stats returns a LIST of gviz DataTables as JSON
(host + device), NOT csv — a smoke run proved the tqx=out:csv hint is
ignored in this build. These tests feed a synthetic pair of tables
through main() to pin the parse, categorisation, and CSV dump."""

import json
import sys

import pytest

pytestmark = pytest.mark.fast

COLS = [{"id": i} for i in (
    "rank", "host_or_device", "type", "operation", "occurrences",
    "total_time", "avg_time", "total_self_time", "avg_self_time",
    "device_total_self_time_percent",
    "device_cumulative_total_self_time_percent",
    "host_total_self_time_percent", "Host_cumulative_total_self_time_percent",
    "measured_flop_rate", "model_flop_rate", "measured_memory_bw",
    "operational_intensity", "bound_by", "eager")]


def _row(host, typ, op, self_us, bound="Compute"):
    vals = [1.0, host, typ, op, 10.0, self_us, self_us, self_us, self_us,
            0.5, 0.5, 0.0, 0.0, 90e12, 95.0, 800.0, 120.0, bound, "Function"]
    return {"c": [{"v": v} for v in vals]}


TABLES = [
    {"cols": COLS, "rows": [_row("Host", "IDLE", "IDLE", 0.0)]},
    {"cols": COLS, "rows": [
        _row("Device", "convolution", "conv_general_dilated.42", 4000.0),
        _row("Device", "fusion", "loop_fusion.7", 1000.0, "Memory"),
        _row("Device", "custom-call", "tpu_custom_call.flash", 500.0),
        _row("Device", "IDLE", "IDLE", 99999.0),
    ]},
]


def test_parses_gviz_tables(monkeypatch, tmp_path, capsys):
    d = tmp_path / "trace" / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    (d / "host.xplane.pb").write_bytes(b"\x00")

    import types
    fake_rtd = types.SimpleNamespace(
        xspace_to_tool_data=lambda xs, tool, opts: (json.dumps(TABLES), None))
    monkeypatch.setitem(sys.modules, "xprof", types.ModuleType("xprof"))
    conv = types.ModuleType("xprof.convert")
    conv.raw_to_tool_data = fake_rtd
    monkeypatch.setitem(sys.modules, "xprof.convert", conv)
    monkeypatch.setitem(sys.modules, "xprof.convert.raw_to_tool_data",
                        fake_rtd)

    sys.path.insert(0, "tools")
    import analyze_trace
    csv_out = tmp_path / "ops.csv"
    monkeypatch.setattr(sys, "argv",
                        ["analyze_trace", str(tmp_path / "trace"),
                         "--csv", str(csv_out)])
    analyze_trace.main()
    out = json.loads(capsys.readouterr().out)
    assert out["scope"] == "device"
    assert out["device_total_us"] == 5500.0  # IDLE excluded
    assert out["by_category_us"]["conv"] == 4000.0
    assert out["by_category_us"]["pallas"] == 500.0
    assert out["by_category_pct"]["conv"] == pytest.approx(72.7, abs=0.1)
    assert out["top_ops"][0]["op"] == "conv_general_dilated.42"
    assert out["top_ops"][1]["bound_by"] == "Memory"
    assert csv_out.read_text().count("\n") == 4  # header + 3 ops (no IDLE)
