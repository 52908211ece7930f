"""jssenv_tpu: TPU-native job-shop scheduling environment engine."""
__version__ = "0.1.0"
