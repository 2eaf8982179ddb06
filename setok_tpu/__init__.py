"""setok-tpu: TPU-native SeTok vision tokenizer + Setokim MLLM.

See README.md for the architecture and PARITY.md for the reference map.
"""

__version__ = "0.1.0"

from setok_tpu import config  # noqa: F401

__all__ = ["config", "__version__"]


def _lazy(name, module, attr):
    def load():
        import importlib
        return getattr(importlib.import_module(module), attr)
    return load


# Convenience lazy exports (avoid importing jax at package import time for
# pure-data users):
_LAZY = {
    "SeTok": ("setok_tpu.models.setok", "SeTok"),
    "SetokTokenizer": ("setok_tpu.models.tokenizer", "SetokTokenizer"),
    "SetokDeTokenizer": ("setok_tpu.models.detokenizer", "SetokDeTokenizer"),
    "Setokim": ("setok_tpu.models.setokim", "Setokim"),
    "LlamaForCausalLM": ("setok_tpu.models.llama", "LlamaForCausalLM"),
    "load_pretrained_model": ("setok_tpu.models.builder",
                              "load_pretrained_model"),
    "Stage1Trainer": ("setok_tpu.train.stage1", "Stage1Trainer"),
    "Stage2Trainer": ("setok_tpu.train.stage2", "Stage2Trainer"),
    "generate": ("setok_tpu.models.generate", "generate"),
    "generate_text": ("setok_tpu.models.generate", "generate_text"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib
        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'setok_tpu' has no attribute {name!r}")
