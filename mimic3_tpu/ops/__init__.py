"""TPU compute ops: spectrograms, Pallas kernels for the hot paths."""
