"""StarkMachine: chip set + setup + machine-level prove/verify.

(reference: crates/stark/src/machine.rs — setup commits preprocessed traces
into pk/vk; verify replays every shard with a cloned challenger and checks
the global septic digest sum; here the global digest check is wired once the
Global chip lands, the local cumulative-sum check is per shard.)
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .chip import Chip
from .proof import MachineProof
from .prover import prove_shard
from .verifier import verify_shard, VerificationError


@dataclass
class ProvingKey:
    commit: np.ndarray
    data: object  # pcs ProverData or None
    chip_ordering: dict  # chip name -> index in preprocessed batch
    chip_information: list  # (name, Domain, (h, w), local_only)
    preprocessed_by_name: dict  # name -> trace
    vk: "VerifyingKey"


@dataclass
class VerifyingKey:
    commit: np.ndarray
    chip_information: list  # (name, Domain, (h, w), local_only)
    extra_observations: list = field(default_factory=list)
    commit_kind: str = "kb"  # "kb" | "bn254" (outer/wrap config)

    def observe_into(self, ch):
        if self.commit_kind == "bn254":
            # outer config: the vk commit is ONE Fr digest; the multifield
            # challenger duplexes on demand, no rate padding convention
            ch.observe_fr(int(self.commit))
            for x in self.extra_observations:
                ch.observe(int(x))
            return
        ch.observe_slice(np.asarray(self.commit, np.uint32))
        for x in self.extra_observations:
            ch.observe(int(x))
        total = 8 + len(self.extra_observations)
        pad = (-total) % 8
        for _ in range(pad):
            ch.observe(0)


class StarkMachine:
    def __init__(self, config, airs, num_public_values=0):
        self.config = config
        self.chips = [Chip(a, num_public_values) for a in airs]
        self.chip_by_name = {c.name: c for c in self.chips}
        self.num_public_values = num_public_values

    def setup(self, program=None, extra_observations=None):
        pcs = self.config.pcs
        named = []
        for chip in self.chips:
            prep = chip.air.generate_preprocessed(program)
            if prep is not None:
                assert prep.shape[1] == chip.preprocessed_width, chip.name
                named.append((chip, np.asarray(prep, np.uint32)))
        named.sort(key=lambda t: -t[1].shape[0])
        if named:
            domains = [pcs.natural_domain_for_degree(t.shape[0]) for _, t in named]
            commit, data = pcs.commit(list(zip(domains, [t for _, t in named])))
            info = [
                (c.name, d, t.shape, c.local_only)
                for (c, t), d in zip(named, domains)
            ]
        elif getattr(self.config, "commit_kind", "kb") == "bn254":
            commit, data, info = 0, None, []  # zero Fr digest
        else:
            commit, data, info = np.zeros(8, dtype=np.uint32), None, []
        vk = VerifyingKey(
            commit, info, list(extra_observations or []),
            commit_kind=getattr(self.config, "commit_kind", "kb"),
        )
        pk = ProvingKey(
            commit=commit,
            data=data,
            chip_ordering={c.name: i for i, (c, _) in enumerate(named)},
            chip_information=info,
            preprocessed_by_name={c.name: t for c, t in named},
            vk=vk,
        )
        return pk, vk

    def prove(self, pk, records, parallel: bool = True,
              fix_shapes: bool = False, devices=None) -> MachineProof:
        """Prove every shard. Shards are transcript-independent (each gets a
        clone of the post-vk challenger, reference prover.rs). On the host
        backend they prove concurrently in a thread pool (numpy and the
        native kernels release the GIL); on the device backend the TPU is
        the parallelism and shards stream through it sequentially.

        fix_shapes=True pads every shard to one batch-wide shape
        (stark/shape.py) so the device path compiles ONE kernel set for
        the whole batch instead of one per distinct trace height."""
        from .backend import backend_name

        if (
            backend_name() == "device"
            and getattr(self.config, "device_capable", True)
            and devices is None
        ):
            from . import fused

            if fused.enabled():
                # whole-shard fused executable: one device dispatch per
                # shard, zero per-chip kernels (stark/fused.py)
                return fused.prove_shards_fused(self, pk, records)

        pipelined = False
        if fix_shapes and len(records) > 1:
            from .shape import estimate_targets, fix_shape

            if backend_name() == "device" and getattr(
                self.config, "device_capable", True
            ):
                # cost-model targets without trace generation: shard trace
                # gen then runs in worker threads OVERLAPPED with earlier
                # shards' async device proves (reference prove_with_context
                # 3-stage pipeline)
                targets = estimate_targets(self, records)
                pipelined = targets is not None
            if not pipelined:
                fix_shape(self, records)

        base = self.config.challenger()
        pk.vk.observe_into(base)
        if backend_name() == "device" and getattr(
            self.config, "device_capable", True
        ):
            import jax

            from .jprover import dispatch_shard_device, finish_shard_device

            # dispatch every shard (async device work overlaps the next
            # shard's host trace generation), then ONE synchronizing fetch.
            # With `devices`, shards round-robin across them (data-parallel
            # eager path; shard_map batching lives in stark/sharded.py)
            gen_futs = None
            if pipelined:
                import os
                from concurrent.futures import ThreadPoolExecutor

                from .shape import generate_fixed

                pool = ThreadPoolExecutor(
                    max_workers=min(len(records), os.cpu_count() or 4)
                )
                gen_futs = [
                    pool.submit(generate_fixed, self, r, targets)
                    for r in records
                ]
            dispatches = []
            for i, r in enumerate(records):
                if gen_futs is not None:
                    gen_futs[i].result()
                if devices:
                    with jax.default_device(devices[i % len(devices)]):
                        dispatches.append(
                            dispatch_shard_device(self, pk, r, base.clone())
                        )
                else:
                    dispatches.append(
                        dispatch_shard_device(self, pk, r, base.clone())
                    )
            if gen_futs is not None:
                pool.shutdown(wait=False)
            gots = jax.device_get([d["fetch"] for d in dispatches])
            return MachineProof(
                [
                    finish_shard_device(pk, d, got)
                    for d, got in zip(dispatches, gots)
                ]
            )
        if len(records) <= 1 or not parallel:
            return MachineProof(
                [prove_shard(self, pk, r, base.clone()) for r in records]
            )
        from concurrent.futures import ThreadPoolExecutor

        import os

        workers = min(len(records), os.cpu_count() or 4)
        with ThreadPoolExecutor(max_workers=workers) as pool:
            futs = [
                pool.submit(prove_shard, self, pk, r, base.clone())
                for r in records
            ]
            return MachineProof([f.result() for f in futs])

    def verify(self, vk, proof: MachineProof) -> bool:
        base = self.config.challenger()
        vk.observe_into(base)
        if not proof.shard_proofs:
            raise VerificationError("empty proof")
        for sp in proof.shard_proofs:
            ch = base.clone()
            verify_shard(self, vk, sp, ch)
        # global septic digest balance across shards
        # (reference: machine.rs:659-674)
        from ziren_tpu.core import septic as S

        digests = []
        for sp in proof.shard_proofs:
            for name, vals in zip(sp.chip_names, sp.opened_values):
                if self.chip_by_name[name].commit_scope.name == "Global":
                    g = vals.global_cumulative_sum
                    digests.append((g[:7], g[7:14]))
        if digests and not S.digests_balance(digests):
            raise VerificationError("global cumulative sum does not balance")
        return True
