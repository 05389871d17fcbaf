"""Host-side utilities: WAV I/O, resampling, checkpoint conversion, profiling."""
