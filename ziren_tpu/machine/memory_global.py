"""MemoryInitChip / MemoryFinalChip: offline memory-checking endpoints
(reference: crates/core/machine/src/memory/global.rs).

v1 scope: single-shard proofs — the endpoints balance the Memory multiset
locally (LookupScope::Local). The multi-shard septic-curve global digest
(reference GlobalChip) replaces the Local scope in a later milestone.

Soundness notes:
  * rows sorted by strictly increasing address (range-checked diff) so no
    address can be initialized or finalized twice;
  * init values byte-range-checked (they enter the multiset unchecked).
"""

from __future__ import annotations

import numpy as np

from ziren_tpu.executor.opcode import ByteOpcode as B
from ziren_tpu.stark.chip import Air
from ziren_tpu.stark.lookup import LookupKind
from .byte import count, count_u8_word, send_byte, send_u8_word
from .layout import Layout, pack_word, pad_to_pow2, word_decompose_np


def _layout(with_ts: bool) -> Layout:
    l = (
        Layout()
        .add("addr")
        .word("value")
        .add("addr_diff", 4)
        .add("is_real")
        .add("has_next")  # is_real AND next row is real (lookup mults cannot
        # reference the next row, and the last row wraps around)
    )
    if with_ts:
        l.add("shard").add("clk")
    return l


def _fill_common(w, addrs, values, n):
    w.set("addr", addrs)
    w.set_word("value", values)
    diffs = np.zeros((n, 4), dtype=np.uint32)
    if n > 1:
        d = (addrs[1:] - addrs[:-1] - 1).astype(np.uint64)
        diffs[: n - 1] = word_decompose_np(d)
    w.set("addr_diff", diffs)
    w.set("is_real", np.ones(n))
    has_next = np.ones(n, dtype=np.uint32)
    if n:
        has_next[n - 1] = 0
    w.set("has_next", has_next)


def _eval_ordering(b, L, N):
    """Strictly increasing addresses among real rows."""
    b.assert_bool(L["is_real"])
    b.assert_bool(L["has_next"])
    # once padding starts it never stops
    b.when_transition().assert_zero(N["is_real"] * (1 - L["is_real"]))
    # has_next == is_real * next.is_real (and 0 on the physically last row)
    b.when_transition().assert_eq(L["has_next"], L["is_real"] * N["is_real"])
    b.when_last_row().assert_zero(L["has_next"])
    d = L["addr_diff"]
    b.when_transition().assert_zero(
        L["has_next"] * (N["addr"] - L["addr"] - 1 - pack_word(d))
    )
    # diff bytes valid and < 2^31
    send_byte(b, B.U8Range, d[0], d[1], 0, L["has_next"])
    send_byte(b, B.U8Range, d[2], d[3], 0, L["has_next"])
    send_byte(b, B.MSB, d[3], 0, 0, L["has_next"])


def _count_ordering(record, addrs, n):
    if n > 1:
        d = (addrs[1:] - addrs[:-1] - 1).astype(np.uint64)
        db = word_decompose_np(d)
        count_u8_word(record, db)
        count(record, B.MSB, db[:, 3], 0)


class MemoryInitChip(Air):
    name = "MemoryInit"
    COLS = _layout(with_ts=False)
    width = COLS.width

    def included(self, record):
        return True

    def generate_dependencies(self, record, output):
        addrs = np.array([a for a, _ in record.mem_init], dtype=np.int64)
        vals = np.array([v for _, v in record.mem_init], dtype=np.int64)
        n = len(addrs)
        count_u8_word(record, word_decompose_np(vals))
        _count_ordering(record, addrs, n)

    def generate_trace(self, record, output):
        addrs = np.array([a for a, _ in record.mem_init], dtype=np.int64)
        vals = np.array([v for _, v in record.mem_init], dtype=np.int64)
        n = len(addrs)
        w = self.COLS.writer(n)
        _fill_common(w, addrs, vals, n)
        return pad_to_pow2(w.mat)

    def eval(self, b):
        L = self.COLS.view(b.main_local)
        N = self.COLS.view(b.main_next)
        _eval_ordering(b, L, N)
        send_u8_word(b, L.word("value"), L["is_real"])
        # overall init endpoint: a global *send* (cancels the first shard's
        # initial-tuple receive in the septic digest)
        b.send(
            LookupKind.Global,
            [0, 0, L["addr"]] + list(L.word("value"))
            + [L["is_real"], 0, int(LookupKind.Memory)],
            L["is_real"],
        )


class MemoryFinalChip(Air):
    name = "MemoryFinal"
    COLS = _layout(with_ts=True)
    width = COLS.width

    def generate_dependencies(self, record, output):
        addrs = np.array([a for a, _, _, _ in record.mem_final], dtype=np.int64)
        _count_ordering(record, addrs, len(addrs))

    def generate_trace(self, record, output):
        addrs = np.array([a for a, _, _, _ in record.mem_final], dtype=np.int64)
        shards = np.array([s for _, s, _, _ in record.mem_final], dtype=np.int64)
        clks = np.array([c for _, _, c, _ in record.mem_final], dtype=np.int64)
        vals = np.array([v for _, _, _, v in record.mem_final], dtype=np.int64)
        n = len(addrs)
        w = self.COLS.writer(n)
        _fill_common(w, addrs, vals, n)
        w.set("shard", shards)
        w.set("clk", clks)
        return pad_to_pow2(w.mat)

    def eval(self, b):
        L = self.COLS.view(b.main_local)
        N = self.COLS.view(b.main_next)
        _eval_ordering(b, L, N)
        # overall finalize endpoint: a global *receive*
        b.send(
            LookupKind.Global,
            [L["shard"], L["clk"], L["addr"]] + list(L.word("value"))
            + [0, L["is_real"], int(LookupKind.Memory)],
            L["is_real"],
        )
