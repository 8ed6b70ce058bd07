"""Synthetic ALU sub-operations: chips like MiscInstrs (EXT/INS), DivRem and
MaddSub decompose into SLL/SRL/ROR/ADD/SLTU/MULT sub-operations dispatched
through the same Instruction lookup with the sentinel pc UNUSED_PC = 1
(reference: crates/stark/src/air/builder.rs send_alu/send_alu_with_hi)."""

from __future__ import annotations

import numpy as np

UNUSED_PC = 1


def emit(record, opcode, a, b, c, hi=0):
    record.synthetic.setdefault(int(opcode), []).append(
        (int(a) & 0xFFFFFFFF, int(b) & 0xFFFFFFFF, int(c) & 0xFFFFFFFF, int(hi) & 0xFFFFFFFF)
    )


def op_array(record):
    """Per-cycle opcode array, cached on the record (shared by every
    instruction-family chip's trace gen and row counting)."""
    arr = getattr(record, "_op_array", None)
    if arr is None:
        cols = record.freeze()
        instrs = record.program.instructions
        opmap = np.array([int(i.opcode) for i in instrs], dtype=np.int64)
        arr = opmap[cols["instr_idx"]] if len(opmap) else cols["instr_idx"]
        try:
            record._op_array = arr
        except AttributeError:
            pass
    return arr


def count_rows(record, opcodes) -> int:
    """Row count a family chip's trace will have BEFORE padding: real
    cpu rows of `opcodes` plus emitted synthetic sub-operations (the cost
    model — reference core/executor/src/cost.rs)."""
    ops = op_array(record)
    n = int(np.isin(ops, [int(o) for o in opcodes]).sum())
    for op in opcodes:
        n += len(record.synthetic.get(int(op), []))
    return n


def merged_rows(record, opcodes):
    """Real cpu rows for `opcodes` plus synthetic sub-operations.

    Returns a dict of int64 arrays: pc, next_pc, next_next_pc, a, b, c,
    prev_a (carries hi for synthetic rows), opcode; plus n_real.
    """
    cols = record.freeze()
    ops = op_array(record)
    mask = np.isin(ops, [int(o) for o in opcodes])
    out = {k: list(cols[k][mask]) for k in ("pc", "next_pc", "next_next_pc", "a", "b", "c", "prev_a")}
    out["opcode"] = list(ops[mask])
    n_real = int(mask.sum())
    for op in opcodes:
        for a, b, c, hi in record.synthetic.get(int(op), []):
            out["pc"].append(UNUSED_PC)
            out["next_pc"].append(UNUSED_PC + 4)
            out["next_next_pc"].append(UNUSED_PC + 8)
            out["a"].append(a)
            out["b"].append(b)
            out["c"].append(c)
            out["prev_a"].append(hi)
            out["opcode"].append(int(op))
    return {k: np.asarray(v, dtype=np.int64) for k, v in out.items()}, n_real
