from .hostjax import cpu_device, cpu_jit

__all__ = ["cpu_device", "cpu_jit"]
