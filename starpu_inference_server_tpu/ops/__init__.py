"""TPU compute ops: quantization, functional NN layers, Pallas kernels.

This is the compute path the reference delegates to LibTorch/cuDNN
(reference: starpu_setup.cpp:784-846 runs TorchScript forward inside a
StarPU codelet). Here every op is a pure JAX function designed for XLA
fusion on TPU, with Pallas kernels for the quantized matmul hot paths.
"""
