"""Orbax checkpointing: save/restore/rotate + resume semantics.

Parity with the reference's mmcv CheckpointHook behavior
(configs/...12e.py:222: interval=1, max_keep_ckpts=3) and the
`--resume-from` (full state) vs `load_from` (weights only) split
(tools/train.py:150-151). Checkpoint metadata embeds config + step like
the reference embeds meta (tools/train.py:233-243).
"""

import os
from dataclasses import asdict
from typing import Any, Optional

import orbax.checkpoint as ocp

from ..config import ModelConfig


class CheckpointManager:
    def __init__(
        self,
        directory: str,
        cfg: Optional[ModelConfig] = None,
        max_to_keep: int = 3,
    ):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.cfg = cfg
        self.mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any, metrics: Optional[dict] = None):
        meta = {"step": int(step)}
        if self.cfg is not None:
            meta["config"] = asdict(self.cfg)
        if metrics:
            meta["metrics"] = {
                k: float(v) for k, v in metrics.items()
            }
        items = {
            "state": ocp.args.StandardSave(state),
            "meta": ocp.args.JsonSave(meta),
        }
        # params saved as their own item so weights-only loading
        # (`load_from` semantics) needs no optimizer template
        params = getattr(state, "params", None)
        if params is not None:
            items["params"] = ocp.args.StandardSave(params)
        self.mngr.save(step, args=ocp.args.Composite(**items))
        self.mngr.wait_until_finished()

    def save_weights(self, step: int, params: Any):
        """Weights-only save (publish_model semantics: no optimizer)."""
        meta = {"step": int(step)}
        if self.cfg is not None:
            meta["config"] = asdict(self.cfg)
        self.mngr.save(
            step,
            args=ocp.args.Composite(
                params=ocp.args.StandardSave(params),
                meta=ocp.args.JsonSave(meta),
            ),
        )
        self.mngr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.mngr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None):
        """Full resume: params + optimizer + step."""
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        out = self.mngr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(state_template)
            ),
        )
        return out["state"]

    def load_weights(self, params_template: Any, step: Optional[int] = None):
        """`load_from` semantics: weights only, fresh optimizer."""
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        out = self.mngr.restore(
            step,
            args=ocp.args.Composite(
                params=ocp.args.StandardRestore(params_template)
            ),
        )
        return out["params"]
