"""Optional wandb logging, gated exactly as the reference drivers gate it
(train.py:59-63, confidence_train.py, train_ar.py, evaluate.py:590-610):
absent package or --wandb unset degrades to print-only."""
from __future__ import annotations


def maybe_wandb(enabled: bool, project: str, run_name: str, config: dict | None = None):
    """Returns a wandb run or None; never raises on a missing package."""
    if not enabled:
        return None
    try:
        import wandb
    except ImportError:
        print("| WARNING: wandb not installed; logging disabled")
        return None
    return wandb.init(project=project, name=run_name, config=config or {})
