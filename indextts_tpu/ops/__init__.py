"""TPU-native neural/DSP ops: STFT, mel filterbanks, snake activations,
anti-alias resampling, norms, RoPE, attention, and on-device sampling."""
