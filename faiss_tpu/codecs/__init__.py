"""Vector codecs (the reference's L1 quantizer layer, TPU-native)."""
