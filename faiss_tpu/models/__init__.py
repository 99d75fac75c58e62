"""Index families (the reference's L2/L3 Index hierarchy, TPU-native)."""
