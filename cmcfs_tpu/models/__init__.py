"""TPU-native fluid solver framework."""
