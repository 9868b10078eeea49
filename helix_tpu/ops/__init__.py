"""TPU compute kernels: distance/top-k, beam search, CSR expansion."""
