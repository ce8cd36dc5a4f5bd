"""Collective-communication census over compiled (post-GSPMD) HLO text.

Shared by scripts/collective_bytes.py (the SCALING.md numbers) and
tests/test_collective_contract.py (the pinned budget): walks the compiled
module, reports every collective op with its per-device payload bytes,
and classifies each as PER-TRIP (inside a while-loop body — executed once
per loop trip) or once-per-execution.

The per-trip class is the one that matters for the march contract: the
round-4 census found GSPMD turning every raycast march trip's
nearest-neighbor gather into an image-sized masked-gather all-reduce
(~20–45 MB/frame, SCALING.md §2) until parallel/sharded_raycast.py made
the march slab-local. NOTE XLA hoists loop-INVARIANT collectives out of
while bodies during optimization, so an op whose op_name metadata says
"while/body/..." may still be once-per-execution — classification here
is by the op's actual HLO computation, not its trace-time metadata.
"""

from __future__ import annotations

import collections
import re

DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}

COLLECTIVES = (
    "all-reduce", "all-gather", "reduce-scatter", "all-to-all",
    "collective-permute", "collective-broadcast",
)


def tensor_bytes(sig: str) -> int:
    """Total bytes of an HLO type signature like 'f32[6144,6144]' or
    '(f32[6144,6144], f32[6144])'."""
    total = 0
    for dt, dims in re.findall(r"(\w+)\[([0-9,]*)\]", sig):
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def _comp_header(line: str):
    """Computation name if this line opens an HLO computation definition
    (`%name (params...) -> type {`), else None. Parameter lists contain
    nested parens (tuple types), so match on shape, not paren balance:
    opens with a name + '(', ends with '{', and is not an instruction
    (no '=' before the first paren)."""
    s = line.strip()
    if not s.endswith("{"):
        return None
    m = re.match(r"(?:ENTRY\s+)?%?([\w.\-]+)\s*\(", s)
    if m and "=" not in s.split("(", 1)[0]:
        return m.group(1)
    return None


def while_body_computations(hlo: str):
    """Names of HLO computations reachable from any while-loop BODY.
    Built from the text: computation headers + the body=/condition=/
    to_apply=/branch_computations references between them."""
    current = None
    calls = collections.defaultdict(set)   # computation -> callees
    bodies = set()
    for line in hlo.splitlines():
        h = _comp_header(line)
        if h:
            current = h
            continue
        if current is None:
            continue
        for ref in re.findall(r"(?:to_apply|body|condition)=%?([\w.\-]+)", line):
            calls[current].add(ref)
        for ref in re.findall(r"branch_computations=\{([^}]*)\}", line):
            calls[current].update(x.strip().lstrip("%") for x in ref.split(","))
        for ref in re.findall(r"body=%?([\w.\-]+)", line):
            bodies.add(ref)
    reach = set()
    stack = list(bodies)
    while stack:
        c = stack.pop()
        if c in reach:
            continue
        reach.add(c)
        stack.extend(calls.get(c, ()))
    return reach


def census(hlo: str):
    """Group collective ops by (kind, per-device payload bytes, per_trip);
    keeps the op_name metadata (the jax source path) of each group's
    first instance so every byte is attributable. Returns
    (Counter[(kind, bytes, per_trip)] -> count, {key: op_name})."""
    per_trip_comps = while_body_computations(hlo)
    out = collections.Counter()
    names = {}
    current = None
    for line in hlo.splitlines():
        h = _comp_header(line)
        if h:
            current = h
            continue
        m = re.search(r"=\s+(\([^)]*\)|\S+)\s+(" + "|".join(COLLECTIVES) + r")\(", line)
        if not m:
            continue
        sig, kind = m.group(1), m.group(2)
        # all-reduce-start/done pairs: count the start only
        if "-done" in line.split("=")[0]:
            continue
        key = (kind, tensor_bytes(sig), current in per_trip_comps)
        out[key] += 1
        nm = re.search(r'op_name="([^"]*)"', line)
        if nm and key not in names:
            names[key] = nm.group(1)[-120:]
    return out, names
