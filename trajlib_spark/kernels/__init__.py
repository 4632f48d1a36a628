"""Pure-numpy kernels shared by the Arrow-batched pandas UDFs and the test
oracles. No Spark imports here — everything is a deterministic function of
its inputs, which is what makes task retries safe.
"""
