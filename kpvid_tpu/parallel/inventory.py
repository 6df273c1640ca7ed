"""Collective inventory of a compiled (SPMD-partitioned) module.

Parses the optimized HLO text of an AOT-compiled program and tallies every
cross-device collective: op counts and payload bytes per step. This is how
the multi-chip cost of a sharded train/serving graph is priced WITHOUT
hardware — compile over a virtual-device mesh, read the partitioned module
(tools/multichip_cost.py; docs/PERF.md "Multi-chip scaling").

The reference has no distribution story to inventory (single tf.Session,
one GPU — reference train.py:25-29); this subsystem exists because the
TPU-native rebuild scales via jax.sharding meshes (SURVEY §2.5).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

# cross-device collectives as they appear in optimized HLO. '-start' halves
# of async pairs carry the payload; the '-done' halves are skipped so a
# (start, done) pair counts once.
COLLECTIVE_OPS = (
    "all-reduce",
    "all-gather",
    "all-to-all",
    "collective-permute",
    "reduce-scatter",
    "collective-broadcast",
)

# tuple shapes need the non-greedy form: TPU layouts nest parens inside
# the element list — e.g. "(f32[32]{0:T(128)S(1)}, /*index=5*/f32[96,256]
# {1,0:T(8,128)S(1)}) all-reduce(" — so "\([^)]*\)" would stop at the
# first layout paren; "\(.*?\)" extends until the op token follows.
_OP_RE = re.compile(
    r"=\s+(?P<shape>\(.*?\)|[a-z0-9]+\[[0-9,]*\]\S*)\s+"
    r"(?P<op>" + "|".join(COLLECTIVE_OPS) + r")(?P<suffix>-start|-done)?\("
)
_SHAPE_RE = re.compile(r"([a-z][a-z0-9]*)\[([0-9,]*)\]")
_GROUPS_RE = re.compile(r"replica_groups=\{(\{[0-9, ]+\}(?:,\{[0-9, ]+\})*)\}")
_IOTA_GROUPS_RE = re.compile(r"replica_groups=\[(\d+),(\d+)\]<=")

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
    "c64": 8, "c128": 16,
}


def _shape_bytes(shape_str: str) -> int:
    """Total bytes of one (possibly tuple-) shaped HLO value."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shape_str):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES.get(dtype, 4)
    return total


@dataclass
class CollectiveInventory:
    """Per-collective-type op counts and payload bytes for one module."""

    counts: dict = field(default_factory=dict)   # op -> int
    bytes: dict = field(default_factory=dict)    # op -> payload bytes
    group_sizes: dict = field(default_factory=dict)  # group size -> op count

    @property
    def total_ops(self) -> int:
        return sum(self.counts.values())

    @property
    def total_bytes(self) -> int:
        return sum(self.bytes.values())

    def ops_other_than(self, *allowed: str) -> dict:
        return {k: v for k, v in self.counts.items() if k not in allowed}


def collective_inventory(hlo_text: str) -> CollectiveInventory:
    """Tally the collectives in optimized HLO text (compiled.as_text())."""
    inv = CollectiveInventory()
    for line in hlo_text.splitlines():
        m = _OP_RE.search(line)
        if not m or m.group("suffix") == "-done":
            continue
        op = m.group("op")
        payload = _shape_bytes(m.group("shape"))
        inv.counts[op] = inv.counts.get(op, 0) + 1
        inv.bytes[op] = inv.bytes.get(op, 0) + payload
        gm = _GROUPS_RE.search(line)
        if gm:
            first = gm.group(1).split("},{")[0].strip("{}")
            size = len([t for t in first.split(",") if t.strip()])
            inv.group_sizes[size] = inv.group_sizes.get(size, 0) + 1
        else:
            im = _IOTA_GROUPS_RE.search(line)
            if im:  # iota form [G,S]<=[N]: S devices per group
                size = int(im.group(2))
                inv.group_sizes[size] = inv.group_sizes.get(size, 0) + 1
    return inv


def inventory_compiled(compiled) -> CollectiveInventory:
    """Inventory a jax Compiled object (jit(f).lower(...).compile())."""
    return collective_inventory(compiled.as_text())
