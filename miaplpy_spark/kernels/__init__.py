"""Pure-NumPy kernels (no Spark imports) — usable both inside pandas
UDFs and directly from pytest, mirroring the reference's pattern of
exporting ``*_py`` twins of its Cython kernels
(/root/reference/src/miaplpy/lib/utils.pxd:1-73).
"""
