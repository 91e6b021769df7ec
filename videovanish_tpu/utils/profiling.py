"""xprof trace parsing, per-program MFU, and the multi-chip projection
model (VERDICT r3 item 8: "actually fast" needs a denominator, and the
north star — 10 f/s 720p on v5p-8, BASELINE.md — needs an arithmetic
bridge from single-chip measurements).

The reference has no profiling at all (SURVEY.md §5); its deps' compute
is opaque CUDA. Here every bench can attach an xprof capture, split
device self-time per jit program, convert xprof's measured flop rates
into MFU against the chip's peak, and project the measured split onto
an n-chip ("data","model") mesh using the ACTUAL sharding design of the
pipeline (which parts shard, which replicate — see project_multichip).
"""
from __future__ import annotations

import glob
import json
import os
import re

# bf16 peak matmul TFLOP/s per chip, by jax device_kind substring.
# Overridable with VV_PEAK_TFLOPS (e.g. unreleased kinds).
_PEAK_TFLOPS = (
    ("v5 lite", 197.0), ("v5e", 197.0),
    ("v5p", 459.0), ("v5", 459.0),
    ("v4", 275.0),
    ("v6 lite", 918.0), ("v6e", 918.0),
    ("cpu", 0.1),  # placeholder so CPU smoke runs produce finite MFU
)


def peak_tflops(device_kind: str | None = None) -> float:
    env = os.environ.get("VV_PEAK_TFLOPS")
    if env:
        return float(env)
    if device_kind is None:
        import jax
        device_kind = jax.devices()[0].device_kind
    kind = device_kind.lower()
    for sub, peak in _PEAK_TFLOPS:
        if sub in kind:
            return peak
    return 197.0  # conservative default


def parse_framework_op_stats(trace_dir: str) -> list[dict]:
    """Parse an xprof trace dir into framework_op_stats rows (dicts
    keyed by gviz column id: type, operation, total_self_time [us],
    occurrences, measured_flop_rate, host_or_device, ...)."""
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION",
                          "python")
    xplanes = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                               recursive=True))
    if not xplanes:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    from xprof.convert import raw_to_tool_data as rttd
    data, _ = rttd.xspace_to_tool_data(xplanes, "framework_op_stats", {})
    table = json.loads(data)
    cols = [c["id"] for c in table[0]["cols"]]
    return [{cols[i]: cell["v"] for i, cell in enumerate(r["c"])}
            for r in table[0]["rows"]]


def device_rows(rows: list[dict]) -> tuple[list[dict], str]:
    dev = [r for r in rows
           if str(r.get("host_or_device", "")).lower() == "device"]
    if dev:
        return dev, "device"
    return rows, "host"


_PROG_RE = re.compile(r"^jit\(([^)]+)\)")


def program_of(op_name: str) -> str:
    """'jit(denoise_window)/UNet/...' -> 'denoise_window'; 'IDLE' -> 'IDLE'."""
    m = _PROG_RE.match(str(op_name))
    return m.group(1) if m else str(op_name).split("/", 1)[0]


def aggregate_programs(rows: list[dict],
                       peak_tf: float | None = None) -> dict[str, dict]:
    """Per-jit-program device split: self-time (ms), share, and MFU.

    MFU = sum_i(flop_rate_i * self_time_i) / (self_time_total * peak):
    xprof's measured_flop_rate column is GFLOP/s per op (model flops /
    measured time), so the time-weighted mean over a program's ops is
    the program's sustained flop rate; dividing by the chip's bf16 peak
    gives its MXU utilization. Ops with no flop rate (copies, gathers,
    IDLE) contribute time but zero flops — exactly the dilution a
    roofline view should show.
    """
    peak = (peak_tf if peak_tf is not None else peak_tflops()) * 1e12
    agg: dict[str, dict] = {}
    for r in rows:
        prog = program_of(r.get("operation", "?"))
        us = float(r.get("total_self_time", 0) or 0)
        rate = float(r.get("measured_flop_rate", 0) or 0)  # GFLOP/s
        d = agg.setdefault(prog, {"us": 0.0, "flops": 0.0, "serial_us": 0.0})
        d["us"] += us
        d["flops"] += rate * 1e9 * us * 1e-6
        # while-loop ops = the sequential propagation scans (the only
        # while programs in the pipeline); they replicate on a mesh
        if "/while/" in str(r.get("operation", "")):
            d["serial_us"] += us
    total_us = sum(d["us"] for d in agg.values()) or 1.0
    out = {}
    for prog, d in sorted(agg.items(), key=lambda kv: -kv[1]["us"]):
        out[prog] = {
            "ms": round(d["us"] / 1e3, 1),
            "share": round(d["us"] / total_us, 4),
            "mfu": round(d["flops"] / (d["us"] * 1e-6 * peak), 4)
            if d["us"] else 0.0,
            "serial_ms": round(d["serial_us"] / 1e3, 1),
        }
    return out


_CATEGORY_BY_TYPE = {
    "pallas_call": "attention-kernel",
    "conv_general_dilated": "conv",
    "dot_general": "matmul",
    "gather": "gather",
    "scatter": "gather",
    "dynamic_slice": "gather",
    "dynamic_update_slice": "gather",
    "reshape": "layout",
    "transpose": "layout",
    "copy": "layout",
    "bitcast": "layout",
    "slice": "layout",
    "concatenate": "layout",
    "pad": "layout",
    "reduce": "reduction",
    "reduce_window": "reduction",
    "all_reduce": "collective",
    "all_gather": "collective",
    "collective_permute": "collective",
    "fusion": "fusion",
}


def breakdown_program(rows: list[dict], program: str,
                      peak_tf: float | None = None,
                      by_module: bool = True) -> list[dict]:
    """Intra-program attribution (VERDICT r4 item 2): ops inside
    `jit(program)` grouped by (module, op-category) with self-time and
    MFU per group, sorted by time. `module` is the first scope segment
    after the jit wrapper (e.g. UNetCondition / BrushNetModel /
    consistency_step), so a blended low-MFU program can be split into
    its attention / conv / elementwise constituents."""
    peak = (peak_tf if peak_tf is not None else peak_tflops()) * 1e12
    agg: dict[tuple, dict] = {}
    for r in rows:
        name = str(r.get("operation", "?"))
        if program_of(name) != program:
            continue
        parts = name.split("/")
        module = parts[1].split(".")[0] if by_module and len(parts) > 1 \
            else ""
        cat = _CATEGORY_BY_TYPE.get(str(r.get("type", "")), "elementwise")
        us = float(r.get("total_self_time", 0) or 0)
        rate = float(r.get("measured_flop_rate", 0) or 0)
        d = agg.setdefault((module, cat),
                           {"us": 0.0, "flops": 0.0, "occ": 0})
        d["us"] += us
        d["flops"] += rate * 1e9 * us * 1e-6
        d["occ"] += int(float(r.get("occurrences", 1) or 1))
    total_us = sum(d["us"] for d in agg.values()) or 1.0
    out = []
    for (module, cat), d in sorted(agg.items(), key=lambda kv: -kv[1]["us"]):
        out.append({
            "module": module, "category": cat,
            "ms": round(d["us"] / 1e3, 1),
            "share": round(d["us"] / total_us, 4),
            "mfu": round(d["flops"] / (d["us"] * 1e-6 * peak), 4)
            if d["us"] else 0.0,
            "occ": d["occ"],
        })
    return out


def window_batch_speedup(n_windows: int, n_chips: int,
                         n_groups: int = 2) -> float:
    """Window-parallel speedup of the InpaintGenerator leg: windows
    batch per ref-count group (<= n_groups distinct counts per chunk,
    models/propainter/model.py), each group padded to a multiple of the
    data axis. Sequential cost n_windows -> sharded cost = number of
    per-group rounds."""
    if n_chips <= 1 or n_windows <= 0:
        return 1.0
    # worst split: (n_windows - n_groups + 1) + 1 * (n_groups - 1)
    big = n_windows - (n_groups - 1)
    rounds = -(-big // n_chips) + (n_groups - 1) * 1
    return n_windows / max(1, rounds)


def project_multichip(programs: dict[str, dict], n_chips: int = 8,
                      frames: int | None = None,
                      n_windows: int = 9,
                      overlap_transfers: bool = True) -> dict:
    """Project the measured per-program device split onto an n-chip
    mesh under the pipeline's ACTUAL sharding design:

      - denoise_window, VAE encode/decode, prior resize: frame-sharded
        -> /n (ring attention keeps the temporal softmax exact);
      - stage1: conv part /n; its while-loop scans (image propagation +
        flow-completion recurrence) replicate -> serial;
      - window (InpaintGenerator): window-axis sharded with per-group
        padding -> window_batch_speedup;
      - IDLE: host-link gaps. v5p hosts feed chips via local PCIe DMA
        that overlaps compute (unlike this tunnel), so the default
        drops it; overlap_transfers=False keeps it (conservative).

    Returns {projected_ms, measured_ms, reduction_x, per_program}.
    """
    proj = {}
    total = 0.0
    for prog, d in programs.items():
        ms, serial = d["ms"], d.get("serial_ms", 0.0)
        if prog == "IDLE":
            new = 0.0 if overlap_transfers else ms
        elif prog in ("window", "window_batch"):
            new = ms / window_batch_speedup(n_windows, n_chips)
        else:
            # conv/matmul part shards over frames; scans replicate
            new = (ms - serial) / n_chips + serial
        proj[prog] = round(new, 1)
        total += new
    measured = sum(d["ms"] for d in programs.values())
    out = {
        "n_chips": n_chips,
        "measured_ms": round(measured, 1),
        "projected_ms": round(total, 1),
        "reduction_x": round(measured / total, 2) if total > 0 else 0.0,
        "per_program": proj,
        "assumes_transfer_overlap": overlap_transfers,
    }
    if frames and total > 0:
        out["projected_fps"] = round(frames / (total / 1e3), 2)
    return out
