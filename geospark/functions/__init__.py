from geospark.functions import kernels  # noqa: F401
