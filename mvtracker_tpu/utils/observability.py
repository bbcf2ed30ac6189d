"""Rank-aware logging and hang watchdog (L7 aux).

TPU-native equivalents of the reference's CLI utilities:

- `RankedLogger` (reference `mvtracker/cli/utils/pylogger.py:7-51`):
  prefixes every record with the process index and can restrict emission to
  rank 0 — multi-host JAX runs one Python process per host, so
  `jax.process_index()` plays the role of the DDP global rank.
- `install_hang_watchdog` (reference `cli/utils/helpers.py:45-47`,
  config `configs/train.yaml:106-110`): faulthandler dumps all thread
  stacks if the process makes no progress for `timeout_s` — the tool that
  turns a silent SPMD deadlock (one host missing a collective) into a
  stack trace.
"""

from __future__ import annotations

import faulthandler
import logging
from typing import Optional


def _process_index() -> int:
    try:
        import jax

        return jax.process_index()
    except Exception:  # pragma: no cover - jax not initialized / no backend
        return 0


class RankedLogger(logging.LoggerAdapter):
    """Logger adapter that prefixes records with the JAX process index.

    With `rank_zero_only=True`, records from other hosts are dropped —
    mirroring the reference's `RankedLogger` semantics
    (`cli/utils/pylogger.py:7-51`).
    """

    def __init__(
        self,
        name: str = __name__,
        rank_zero_only: bool = False,
        extra: Optional[dict] = None,
    ):
        super().__init__(logging.getLogger(name), extra or {})
        self.rank_zero_only = rank_zero_only

    def log(self, level: int, msg, *args, rank: Optional[int] = None, **kwargs):
        """Log, optionally only on a given rank (`rank=`), with prefix.

        `rank=N` emits only on process N; `rank_zero_only` wins if set.
        """
        if not self.isEnabledFor(level):
            return
        current = _process_index()
        if self.rank_zero_only and current != 0:
            return
        if rank is not None and current != rank:
            return
        msg, kwargs = self.process(f"[rank {current}] {msg}", kwargs)
        self.logger.log(level, msg, *args, **kwargs)


def install_hang_watchdog(
    timeout_s: float = 600.0, repeat: bool = True, exit: bool = False
) -> None:
    """Dump all thread stacks if no progress for `timeout_s` seconds.

    Call `reset_hang_watchdog()` periodically (e.g. once per train step) to
    push the deadline forward, and `cancel_hang_watchdog()` on clean exit.
    Mirrors the reference's faulthandler watchdog
    (`cli/utils/helpers.py:45-47`).

    With `exit=True` the process is hard-killed (`os._exit`) after the dump
    instead of hanging forever — for supervised runs where an external loop
    restarts training from the latest checkpoint. A wedged device tunnel
    blocks in uninterruptible device fetches that SIGTERM can't unwind, so
    dump-and-die + restart is the only reliable recovery.
    """
    faulthandler.dump_traceback_later(timeout_s, repeat=repeat, exit=exit)


def reset_hang_watchdog(
    timeout_s: float = 600.0, repeat: bool = True, exit: bool = False
) -> None:
    """Re-arm the watchdog (progress heartbeat)."""
    faulthandler.dump_traceback_later(timeout_s, repeat=repeat, exit=exit)


def cancel_hang_watchdog() -> None:
    faulthandler.cancel_dump_traceback_later()


class ProfilerTraceWindow:
    """Capture a `jax.profiler` trace over a step window.

    The reference has no profiler integration at all (SURVEY §5: "No
    torch.profiler/NVTX anywhere" — only manual phase timing); on TPU the
    native equivalent is an XLA/TensorBoard trace, which records per-op
    device timelines, HLO cost analysis, and host/device transfer gaps.

    Call `step(i)` once per train step: tracing starts when `i == start`
    and stops after `n_steps` steps (or on `close()`). View with
    TensorBoard's profile plugin pointed at `log_dir`.
    """

    def __init__(self, log_dir: str, start: int, n_steps: int = 3):
        self.log_dir = log_dir
        self.start = start
        self.stop_at = start + n_steps
        self._active = False

    def step(self, i: int) -> None:
        import jax

        # >= so a resume past the nominal start still captures a trace
        # (stop_at bounds the duration either way).
        if not self._active and self.start <= i < self.stop_at:
            jax.profiler.start_trace(self.log_dir)
            self._active = True
            logging.info("profiler trace started at step %d -> %s", i, self.log_dir)
        elif self._active and i >= self.stop_at:
            jax.profiler.stop_trace()
            self._active = False
            logging.info("profiler trace written to %s", self.log_dir)

    def close(self) -> None:
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False


def device_memory_stats() -> dict:
    """Per-device HBM usage in MB (the reference logs `gpustat` at
    `cli/train.py:236`; TPU equivalent is the runtime's memory_stats)."""
    stats = {}
    try:
        import jax

        for d in jax.local_devices():
            s = d.memory_stats()
            if s:
                stats[str(d.id)] = {
                    "bytes_in_use_mb": s.get("bytes_in_use", 0) / 2**20,
                    "peak_bytes_in_use_mb": s.get("peak_bytes_in_use", 0) / 2**20,
                }
    except Exception:  # pragma: no cover - backend without memory_stats
        pass
    return stats
