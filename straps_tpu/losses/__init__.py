"""Losses."""

from straps_tpu.losses.multi_task import (
    multi_task_loss, init_loss_log_vars, ALL_TASKS,
)

__all__ = ["multi_task_loss", "init_loss_log_vars", "ALL_TASKS"]
