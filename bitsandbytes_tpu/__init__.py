"""bitsandbytes_tpu: TPU-native k-bit quantization for JAX.

A from-scratch re-design of the capabilities of `bitsandbytes`
(https://github.com/bitsandbytes-foundation/bitsandbytes) for TPU:

* blockwise k-bit quantization (dynamic 8-bit, NF4, FP4, int4, af4, fp8 maps)
* fused dequantize+matmul Pallas kernels (gemm_4bit / gemv_4bit)
* LLM.int8() vector-wise int8 matmul with fp outlier decomposition, running
  natively on the MXU's int8 path
* 8-bit blockwise optimizer states (Adam, AdamW, Lion, SGD, RMSprop,
  Adagrad, LAMB, LARS, AdEMAMix) as optax-style transformations
* Flax linen modules (Linear4bit, Linear8bitLt, embeddings)
* GSPMD/shard_map sharding rules for packed quantized weights

The compute path is jax/XLA/Pallas; there is no FFI boundary.
"""

from . import functional
from . import nn
from . import optim
from .autograd import MatmulLtState, matmul, matmul_4bit
from .functional import QuantState
from .functional.gemm import gemm_4bit, gemv_4bit

__version__ = "0.1.0"

features = {"multi_backend", "tpu"}

__all__ = [
    "functional",
    "nn",
    "optim",
    "matmul",
    "matmul_4bit",
    "gemm_4bit",
    "gemv_4bit",
    "MatmulLtState",
    "QuantState",
    "__version__",
]
