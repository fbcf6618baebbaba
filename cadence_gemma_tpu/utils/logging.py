"""Metric-logging adapters for the training loop's ``log_metrics`` hook.

The reference hard-wires mlflow (jax loop, ``train_jax.py:17,615,765``) and
wandb (torch loop, ``train.py:11-25``); here the loop takes a plain callback
and these adapters (import-gated — neither package is required) plug the
same backends in:

    log = make_logger("mlflow", tracking_uri=..., run_name="sft")
    train_loop(..., log_metrics=log)
"""

from __future__ import annotations

import json
import sys
from typing import Callable

MetricLogger = Callable[[dict, int], None]


def stdout_logger(prefix: str = "train") -> MetricLogger:
  def log(metrics: dict, step: int) -> None:
    print(f"[{prefix}] step {step}: {json.dumps(metrics)}", file=sys.stderr)

  return log


def jsonl_logger(path: str) -> MetricLogger:
  def log(metrics: dict, step: int) -> None:
    with open(path, "a") as f:
      f.write(json.dumps({"step": step, **metrics}) + "\n")

  return log


def mlflow_logger(
    tracking_uri: str | None = None, run_name: str | None = None
) -> MetricLogger:
  import mlflow  # pytype: disable=import-error

  if tracking_uri:
    mlflow.set_tracking_uri(tracking_uri)
  mlflow.start_run(run_name=run_name)

  def log(metrics: dict, step: int) -> None:
    mlflow.log_metrics(
        {k: float(v) for k, v in metrics.items()}, step=step
    )

  return log


def wandb_logger(project: str, **init_kwargs) -> MetricLogger:
  import wandb  # pytype: disable=import-error

  wandb.init(project=project, **init_kwargs)

  def log(metrics: dict, step: int) -> None:
    wandb.log(metrics, step=step)

  return log


def make_logger(backend: str, **kwargs) -> MetricLogger:
  """'stdout' | 'jsonl' | 'mlflow' | 'wandb' → a log_metrics callback."""
  factories = {
      "stdout": stdout_logger,
      "jsonl": jsonl_logger,
      "mlflow": mlflow_logger,
      "wandb": wandb_logger,
  }
  if backend not in factories:
    raise ValueError(f"Unknown logging backend {backend!r}.")
  return factories[backend](**kwargs)
