"""TPU compute kernels: Boys function, McMurchie-Davidson molecular integrals."""
