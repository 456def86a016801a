"""Orbax checkpointing (reference: mmcv ``CheckpointHook`` +
``resume_from``/``load_from`` semantics, ``apis/train.py:139-142``)."""

from __future__ import annotations

import os
import os.path as osp

import orbax.checkpoint as ocp


def _mgr(work_dir):
    path = osp.abspath(osp.join(work_dir, "checkpoints"))
    os.makedirs(path, exist_ok=True)
    return path


def provenance_meta(cfg=None, classes=None):
    """Reference checkpoints embed ``{mmdet_version+git hash, config text,
    CLASSES}`` (reference ``tools/train.py:140-146``); build the analogous
    provenance dict for ours."""
    import subprocess
    from ..version import __version__
    try:
        git = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))),
            capture_output=True, text=True, timeout=10).stdout.strip()
    except Exception:
        git = ""
    meta = {"bonai_tpu_version": f"{__version__}+{git}" if git
            else __version__}
    if cfg is not None:
        meta["config"] = cfg.pretty_text if hasattr(cfg, "pretty_text") \
            else str(cfg)
    if classes is not None:
        meta["CLASSES"] = list(classes)
    return meta


def save_checkpoint(work_dir, step, state, meta=None, max_keep=None):
    """Save {params, opt_state, batch_stats, step} (+ json-able meta).

    ``max_keep`` mirrors the reference ``CheckpointHook``'s
    ``max_keep_ckpts`` (mmcv hook used by
    ``configs/_base_/default_runtime.py:1``): after a successful save the
    oldest finalized checkpoints beyond the newest ``max_keep`` are
    deleted.  Orbax finalizes atomically (temp dir + rename), so a save
    killed mid-write never appears finalized and never triggers pruning
    of the good checkpoints it would have displaced.
    """
    path = osp.join(_mgr(work_dir), f"step_{int(step)}")
    ckpter = ocp.StandardCheckpointer()
    payload = {"params": state.params, "opt_state": state.opt_state,
               "batch_stats": state.batch_stats, "step": state.step}
    ckpter.save(osp.join(path, "state"), payload, force=True)
    ckpter.wait_until_finished()
    if meta is not None:
        import json
        with open(osp.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)
    if max_keep and max_keep > 0:
        import shutil
        root = _mgr(work_dir)
        done = sorted(_finalized_steps(root))
        for s in done[:-max_keep]:
            shutil.rmtree(osp.join(root, f"step_{s}"), ignore_errors=True)
    return path


def _finalized_steps(root):
    """Step numbers under ``root`` whose orbax save fully committed.

    A save killed mid-write leaves either an orbax temp dir (never
    matching ``step_*``'s final layout) or a ``step_N/state`` without the
    ``_CHECKPOINT_METADATA`` commit marker; both are excluded so resume
    never points at a torn checkpoint."""
    steps = []
    for d in os.listdir(root):
        if not d.startswith("step_"):
            continue
        try:
            s = int(d.split("_")[1])
        except (IndexError, ValueError):
            continue
        if osp.isfile(osp.join(root, d, "state", "_CHECKPOINT_METADATA")):
            steps.append(s)
    return steps


def load_meta(path):
    """Read the provenance meta written beside a checkpoint (or None)."""
    import json
    p = osp.join(path, "meta.json")
    if not osp.isfile(p):
        return None
    with open(p) as f:
        return json.load(f)


def latest_checkpoint(work_dir):
    """Newest FINALIZED checkpoint (torn mid-save dirs are skipped, so a
    preempted run always resumes from the last good save)."""
    root = osp.abspath(osp.join(work_dir, "checkpoints"))
    if not osp.isdir(root):
        return None
    steps = _finalized_steps(root)
    if not steps:
        return None
    return osp.join(root, f"step_{max(steps)}")


def load_params_only(path):
    """Restore just {params, batch_stats} from a checkpoint (eval path —
    the optimizer state tree need not match)."""
    ckpter = ocp.StandardCheckpointer()
    restored = ckpter.restore(osp.join(osp.abspath(path), "state"))
    return restored["params"], restored.get("batch_stats", {})


def load_checkpoint(path, abstract_state):
    """Restore into the structure of ``abstract_state`` (a TrainState or a
    matching pytree of ShapeDtypeStructs / arrays)."""
    ckpter = ocp.StandardCheckpointer()
    template = {"params": abstract_state.params,
                "opt_state": abstract_state.opt_state,
                "batch_stats": abstract_state.batch_stats,
                "step": abstract_state.step}
    restored = ckpter.restore(osp.join(osp.abspath(path), "state"), template)
    return abstract_state.replace(**restored)
