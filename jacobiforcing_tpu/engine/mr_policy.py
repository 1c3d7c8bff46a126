"""Measured auto-policy for multiblock-rejection-recycling (MR) serving.

The reference ships MR with GPU-tuned defaults (K=2 blocks, n-gram pool 4 —
inference_engine/config.py:23-30) where extra speculative rows ride free
through underutilized SMs.  On TPU the full candidate tier costs a measured
2.17x wall per iteration at B=1/4k (scripts/probe_mr_iter.py) for a ~1.18x
TPF gain — net-negative — while the middle tier (candidates off) costs only
1.08x.  Whether candidates pay is WORKLOAD-dependent (pool hit-rate,
acceptance structure), so instead of hardcoding a hardware default the
engine measures it online.

Three arms, all running the SAME MR chunk executable over the SAME carried
state (greedy MR == greedy AR token for token — the existing exact-match
test matrix), so arm switches are invisible in the output stream and only
throughput changes:

  * mr_full    — MR as requested (candidates + pseudo blocks);
  * mr_nocand  — MR with the n-gram candidate tier dynamically disabled by
                 raising `lookahead_start` past N (block acceptance can
                 never reach it, so `cand_valid` is always false and the
                 chunk program takes its compute-skipping no-cand forward —
                 same executable, no recompile);
  * mr_ra_only — additionally stops pseudo spawning (spawn threshold N+1),
                 draining the state machine to its RA-only tier: an N-token
                 forward per iteration — single-block Jacobi cost with full
                 MR state continuity.  (Switching to the actual single-block
                 program would drop mb_state; the MR verifier accepts RA
                 draft[0] unconditionally, so a random re-seed on the way
                 back commits a wrong token.)

Policy: interleaved probe windows (round-robin over arms, `probe_chunks`
calls each), then lock to the highest measured committed-token rate;
re-probe every `reprobe_every` calls, and immediately when the locked
arm's recent rate collapses below `drift_ratio` of its lock-time rate (a
drifting workload — e.g. acceptance structure changing as the batch mix
turns over — must not keep a stale winner).  Probe overhead is bounded:
3*probe_chunks / reprobe_every of chunks run a potentially losing arm —
and DECAYS on a stable workload: each reprobe that re-confirms the same
winner doubles the next reprobe interval (capped at `backoff_cap`x), so
steady-state losing-arm traffic tends to 3*probe_chunks /
(backoff_cap*reprobe_every) ≈ 0.3% at the defaults (the round-4 on-chip
demo probe measured auto-policy at 0.967x single-block on a SHORT run —
probe traffic, not a wrong lock; backoff shrinks exactly that term on
long-lived serving).  A winner change or a drift unlock resets the
interval to `reprobe_every`.

Measurement fairness (round-4 on-chip finding, assets/engine_grid_r4):
  * rates are normalized PER BATCH SLOT (tokens / (slots x wall)) — during
    continuous-batching ramp-up/drain, arms land on different batch sizes
    and raw tokens/s would compare workloads, not arms;
  * warmup traffic must not reach the policy at all (compile walls of
    7-11 s per bucket poison whichever arm they land on) — LLMEngine
    clears its policies after warmup().

Wall time must be measured around the chunk INCLUDING its host readback —
on tunneled TPU backends `block_until_ready` does not wait (NOTES.md), and
the engine's chunk paths already end with one batched `jax.device_get`.
"""

from __future__ import annotations

from typing import List, Optional

ARMS = ("mr_full", "mr_nocand", "mr_ra_only")


class MRAutoPolicy:
    """Per-(L, K, C) group online arm selection for MR serving."""

    def __init__(self, probe_chunks: int = 4, reprobe_every: int = 256,
                 drift_ratio: float = 0.6, backoff_cap: int = 16):
        assert probe_chunks >= 1 and reprobe_every > 3 * probe_chunks
        self.probe_chunks = probe_chunks
        self.reprobe_every = reprobe_every
        self.drift_ratio = drift_ratio
        self.backoff_cap = backoff_cap
        self.slot_wall: List[float] = [0.0, 0.0, 0.0]  # sum(slots * wall_s)
        self.tokens: List[int] = [0, 0, 0]
        self.n: List[int] = [0, 0, 0]
        self.calls = 0
        self.locked: Optional[int] = None  # arm index, None while probing
        self._since_lock = 0
        self._lock_rate = 0.0  # per-slot rate at lock time
        self._ema_rate: Optional[float] = None  # recent locked-arm rate
        self._interval = reprobe_every  # current reprobe interval (backoff)
        self._stable = 0  # consecutive reprobes confirming the same winner
        self._last_winner: Optional[int] = None

    # ------------------------------------------------------------------
    def _rate(self, a: int) -> float:
        return self.tokens[a] / self.slot_wall[a] if self.slot_wall[a] > 0 else 0.0

    def _unlock(self, drift: bool = False) -> None:
        # decay history so the new window dominates but past evidence still
        # breaks ties
        self.locked = None
        self.slot_wall = [w * 0.25 for w in self.slot_wall]
        self.tokens = [int(t * 0.25) for t in self.tokens]
        self.n = [0, 0, 0]
        self._ema_rate = None
        if drift:
            # the workload changed under us: stability evidence is stale
            self._stable = 0
            self._interval = self.reprobe_every
            self._last_winner = None

    def pick(self) -> int:
        """Arm for the next chunk call."""
        if self.locked is not None:
            if self._since_lock >= self._interval:
                self._unlock()
            else:
                return self.locked
        # interleave: the arm with the fewest probe samples goes next, so
        # arms see the same workload mix even as the batch drains
        return min(range(3), key=lambda a: (self.n[a], a))

    def record(self, arm: int, tokens: int, wall_s: float,
               slots: int = 1) -> None:
        """Account one chunk call: `tokens` committed over `wall_s` seconds
        by a batch of `slots` sequences (rates are per slot-second)."""
        self.calls += 1
        slots = max(int(slots), 1)
        self.tokens[arm] += int(tokens)
        self.slot_wall[arm] += float(wall_s) * slots
        self.n[arm] += 1
        rate = tokens / max(wall_s * slots, 1e-9)
        if self.locked is not None:
            self._since_lock += 1
            if arm == self.locked:
                self._ema_rate = (
                    rate if self._ema_rate is None
                    else 0.7 * self._ema_rate + 0.3 * rate
                )
                if (
                    self._since_lock >= 3
                    and self._ema_rate < self.drift_ratio * self._lock_rate
                ):
                    # workload drifted under the locked arm
                    self._unlock(drift=True)
            return
        if min(self.n) >= self.probe_chunks:
            self.locked = max(range(3), key=self._rate)
            self._since_lock = 0
            self._lock_rate = self._rate(self.locked)
            self._ema_rate = None
            # reprobe backoff: a re-confirmed winner doubles the next
            # interval (stable workload -> probe overhead decays); a new
            # winner resets it
            if self._last_winner == self.locked:
                self._stable += 1
            else:
                self._stable = 0
            self._interval = self.reprobe_every * min(
                1 << self._stable, self.backoff_cap
            )
            self._last_winner = self.locked

    # ------------------------------------------------------------------
    def snapshot(self) -> dict:
        return {
            "locked": ARMS[self.locked] if self.locked is not None else None,
            "calls": self.calls,
            "tokens_per_slot_s": [round(self._rate(a), 2) for a in range(3)],
            "n": list(self.n),
            "reprobe_interval": self._interval,
        }
