from setok_tpu.serve.engine import Request, ServeEngine
from setok_tpu.serve.calibrate import collect_row_weights

__all__ = ["Request", "ServeEngine", "collect_row_weights"]
