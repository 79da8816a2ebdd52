from pde_multigrid_tpu.utils.metrics import MetricsLogger, norms

__all__ = ["MetricsLogger", "norms"]
