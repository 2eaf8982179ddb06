from setok_tpu.serve.engine import Request, ServeEngine

__all__ = ["Request", "ServeEngine"]
