"""Checkpoint / resume for training state (orbax-backed).

The reference has no persistence of any kind for its trained model — the
HMM lives in process memory and dies with the window (PlotEngine.py:20,
reset at :475-478; only Qt UI settings persist, SURVEY.md §5). The session
layer already superset-fixes that for interactive use (api/session.py
save_state/load_state, NPZ). This module adds the FLEET-scale version:
orbax checkpointing of HMM training state (parameters + EM progress) with
step retention, so a long data-parallel EM run over a mesh can be killed
and resumed — the checkpoint/resume aux subsystem a production framework
needs (SURVEY.md §5 "Checkpoint / resume: absent").

orbax is the standard JAX checkpointing library: sharded-aware, atomic
renames, async-capable. Used synchronously here — HMM states are tiny.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from spectral_tpu.models import hmm


def _manager(directory: str, keep: int = 3):
    import orbax.checkpoint as ocp
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=keep,
                                             create=True))


def save_training_state(directory: str, params: hmm.HMMParams, step: int,
                        loglik: float = float("-inf"),
                        keep: int = 3) -> None:
    """Write one checkpoint step: HMM parameters + scalar progress."""
    import orbax.checkpoint as ocp
    mgr = _manager(directory, keep)
    state = {
        "startprob": np.asarray(params.startprob),
        "transmat": np.asarray(params.transmat),
        "means": np.asarray(params.means),
        "covars": np.asarray(params.covars),
        "loglik": np.asarray(loglik, np.float64),
    }
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


def load_training_state(directory: str, step: Optional[int] = None
                        ) -> Optional[Tuple[hmm.HMMParams, int, float]]:
    """Load (params, step, loglik) from the latest (or given) step; None if
    the directory holds no checkpoints."""
    import jax.numpy as jnp
    import orbax.checkpoint as ocp
    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory)
    try:
        target = step if step is not None else mgr.latest_step()
        if target is None:
            return None
        state = mgr.restore(target, args=ocp.args.StandardRestore())
    finally:
        mgr.close()
    params = hmm.HMMParams(
        startprob=jnp.asarray(state["startprob"]),
        transmat=jnp.asarray(state["transmat"]),
        means=jnp.asarray(state["means"]),
        covars=jnp.asarray(state["covars"]))
    return params, int(target), float(state["loglik"])
