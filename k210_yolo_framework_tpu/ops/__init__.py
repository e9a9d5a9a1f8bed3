"""Pure jnp ops: box geometry, label codecs, letterbox, augment, decode, NMS."""
