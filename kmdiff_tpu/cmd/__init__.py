"""Command layer: count / diff / infos (reference: include/kmdiff/cmd/)."""
