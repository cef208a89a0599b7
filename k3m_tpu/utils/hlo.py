"""HLO collective accounting: what does a compiled step move over ICI?

The reference's scaling mechanism is DDP allreduce (the gradient bucket
all-reduces NCCL issues per step, train_concap_struc.py:301-310,
pretrain.py:59-75). Under GSPMD the equivalent traffic is implicit in the
compiled program, so this module parses a compiled executable's HLO text
and returns every collective op with its payload size — used by
tests/test_hlo_collectives.py to pin the collective *shape* of the train
step (one fused grad all-reduce on the DP path, no parameter-sized
all-gathers under TP) and by `bench.py --n_data/--n_model` to report
bytes-over-ICI per step.
"""

from __future__ import annotations

import re
from collections import defaultdict
from dataclasses import dataclass
from typing import Dict, List

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}

_COLLECTIVE_RE = re.compile(
    r"%?\S+ = (?P<restype>.*?) "
    r"(?P<op>all-gather|all-reduce|reduce-scatter|collective-permute"
    r"|all-to-all)(?P<start>-start)?\(")

_SHAPE_RE = re.compile(
    r"(pred|s8|u8|s16|u16|f16|bf16|s32|u32|f32|s64|u64|f64)\[([\d,]*)\]")


@dataclass
class Collective:
    op: str          # all-gather | all-reduce | reduce-scatter | ...
    nbytes: int      # total result payload (tuple elements summed)
    line: str        # the HLO line (truncated)


def parse_collectives(hlo_text: str) -> List[Collective]:
    """Every collective op in an HLO module, with result payload bytes.

    `-start`/`-done` async pairs are counted once (on the start). An async
    `*-start` op's result type is an (inputs..., outputs...) buffer tuple —
    e.g. `(f32[1024], f32[1024]) all-reduce-start(...)` — so summing every
    tuple element would double-count the payload; only the output half is
    counted (for variadic collectives the halves pair up element-wise).
    Some XLA versions append rank-0 context scalars to the tuple (e.g.
    collective-permute-start returning (in, out, u32[], u32[])): naively
    halving that 4-tuple would keep only the two scalars and drop the real
    payload, so rank-0 elements are excluded from the halving whenever any
    ranked payload element exists."""
    out = []
    for raw in hlo_text.splitlines():
        line = raw.strip()
        m = _COLLECTIVE_RE.match(line)
        if not m:
            continue
        shapes = []        # ranked (payload) element byte sizes
        scalars = []       # rank-0 elements (context scalars, or a true
                           # scalar collective when no ranked payload exists)
        for dt, dims in _SHAPE_RE.findall(m.group("restype")):
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            (scalars if dims == "" else shapes).append(n * _DTYPE_BYTES[dt])
        if not shapes:     # genuinely scalar collective: count the scalars
            shapes, scalars = scalars, []
        if m.group("start") and len(shapes) >= 2:
            shapes = shapes[len(shapes) // 2:]
        out.append(Collective(m.group("op"), sum(shapes), line[:160]))
    return out


def collective_bytes(hlo_text: str) -> Dict[str, int]:
    """Total payload bytes per collective kind."""
    agg: Dict[str, int] = defaultdict(int)
    for c in parse_collectives(hlo_text):
        agg[c.op] += c.nbytes
    return dict(agg)


def max_bytes(hlo_text: str, op: str) -> int:
    sizes = [c.nbytes for c in parse_collectives(hlo_text) if c.op == op]
    return max(sizes) if sizes else 0


def summarize(hlo_text: str) -> str:
    by_op: Dict[str, List[int]] = defaultdict(list)
    for c in parse_collectives(hlo_text):
        by_op[c.op].append(c.nbytes)
    parts = [f"{op}: n={len(v)} bytes={sum(v)} max={max(v)}"
             for op, v in sorted(by_op.items())]
    return "; ".join(parts) if parts else "no collectives"
