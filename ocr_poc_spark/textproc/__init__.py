"""Pure-Python text-processing kernels shared by the oracle and the Spark
parse stage. No Spark imports here — keep importable inside executors."""
