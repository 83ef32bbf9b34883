"""Low-level TPU-native ops: encodings, MLPs, ray marching, rasterization."""
