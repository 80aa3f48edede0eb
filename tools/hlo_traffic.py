"""HBM-traffic breakdown of a compiled XLA program.

Parses compiled HLO text and reports per-instruction bytes
(output + operands) for the entry computation, aggregated by op kind and by
name prefix.  This is the evidence behind BENCH_NOTES' roofline table: XLA's
aggregate 'bytes accessed' says *that* the model is memory-bound; this says
*where* the bytes go.

Usage: python tools/hlo_traffic.py  (flagship RestormerRefFusion 512px)
"""

from __future__ import annotations

import re
import sys
from collections import defaultdict

_DTYPE_BYTES = {
    "f32": 4, "f16": 2, "bf16": 2, "s32": 4, "u32": 4, "s8": 1, "u8": 1,
    "pred": 1, "s64": 8, "u64": 8, "f64": 8, "s16": 2, "u16": 2,
}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(type_str: str) -> int:
    """Total bytes of an HLO type string (handles tuples)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(type_str):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


_NAME_RE = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*")
_OPCODE_RE = re.compile(r"\b([a-z][a-z0-9\-]*)\(")


def _parse_line(ln: str):
    """Returns (name, type_str, opcode, operand_names) or None."""
    m = _NAME_RE.match(ln)
    if not m:
        return None
    name = m.group(1)
    rhs = ln[m.end():]
    op = _OPCODE_RE.search(rhs)
    if not op:
        return None
    type_str = rhs[: op.start()]
    # operand list: opcode '(' to the first ')' (operand lists hold only
    # names/literals, never nested parens)
    tail = rhs[op.end():]
    args = tail.split(")", 1)[0]
    operands = re.findall(r"%([\w.\-]+)", args)
    return name, type_str, op.group(1), operands


def analyze(hlo_text: str, top: int = 30):
    lines = hlo_text.splitlines()
    # first pass: name -> output bytes (across all computations)
    out_bytes: dict[str, int] = {}
    for ln in lines:
        p = _parse_line(ln)
        if p:
            out_bytes[p[0]] = shape_bytes(p[1])

    # entry computation span
    entry_start = None
    for i, ln in enumerate(lines):
        if ln.startswith("ENTRY"):
            entry_start = i
            break
    if entry_start is None:
        raise SystemExit("no ENTRY computation found")
    depth = 0
    entry_lines = []
    for ln in lines[entry_start:]:
        depth += ln.count("{") - ln.count("}")
        entry_lines.append(ln)
        if depth == 0 and entry_lines[1:]:
            break

    rows = []
    for ln in entry_lines:
        p = _parse_line(ln)
        if not p:
            continue
        name, type_str, kind, operands = p
        if kind in ("parameter", "constant", "tuple", "get-tuple-element",
                    "bitcast"):
            continue
        total = out_bytes.get(name, 0) + sum(
            out_bytes.get(o, 0) for o in operands)
        # attach the model-layer name from metadata for readability
        mm = re.search(r'op_name="([^"]+)"', ln)
        label = mm.group(1).split("jit(apply)/")[-1][:80] if mm else name
        rows.append((total, kind, f"{name} {label}"))

    rows.sort(reverse=True)
    by_kind = defaultdict(int)
    for total, kind, _ in rows:
        by_kind[kind] += total
    grand = sum(t for t, _, _ in rows)
    print(f"total traffic (out+operands, entry): {grand/1e9:.2f} GB")
    print("\nby op kind:")
    for k, v in sorted(by_kind.items(), key=lambda kv: -kv[1]):
        print(f"  {k:24s} {v/1e9:8.2f} GB")
    print(f"\ntop {top} instructions:")
    for total, kind, name in rows[:top]:
        print(f"  {total/1e6:9.1f} MB  {kind:12s} {name[:90]}")
    return rows


def main():
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax
    import jax.numpy as jnp
    from textualdegremoval_tpu.models.restormer import RestormerRefFusion

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    model = RestormerRefFusion(
        dim=48, num_blocks=(4, 6, 6, 8), num_refinement_blocks=4,
        heads=(1, 2, 4, 8), nf=48, ext_n_blocks=(4, 4, 4, 4),
        reffusion_n_blocks=(2, 2, 2, 2), lr_block_size=8,
        dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    lq = jax.random.normal(key, (1, size, size, 3), jnp.float32)
    params = jax.jit(model.init)(key, lq, lq)
    compiled = jax.jit(model.apply).lower(params, lq, lq).compile()
    analyze(compiled.as_text())


if __name__ == "__main__":
    main()
