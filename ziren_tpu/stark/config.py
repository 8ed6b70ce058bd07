"""STARK configurations (reference: crates/stark/src/kb31_poseidon2.rs).

`core_config()` mirrors the reference's production parameters (log_blowup=1,
84 queries, 16 PoW bits -> ~100 bits with the KoalaBear ext4 field);
`dev_config()` mirrors its ZKM_DEV_MODE (reduced queries) for fast tests.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from ziren_tpu.core.challenger import DuplexChallenger
from .pcs import FriConfig, TwoAdicFriPcs


@dataclass
class StarkConfig:
    fri: FriConfig

    def __post_init__(self):
        self.pcs = TwoAdicFriPcs(self.fri)

    def challenger(self) -> DuplexChallenger:
        return DuplexChallenger()


def core_config() -> StarkConfig:
    queries = int(os.environ.get("FRI_QUERIES", "84"))
    return StarkConfig(FriConfig(log_blowup=1, num_queries=queries, proof_of_work_bits=16))


def dev_config() -> StarkConfig:
    return StarkConfig(FriConfig(log_blowup=1, num_queries=8, proof_of_work_bits=4))
