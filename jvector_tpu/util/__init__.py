"""IO + utility layer (TPU-native equivalent of the reference's L1)."""
