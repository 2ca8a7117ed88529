"""Host-side data layer: synthetic worlds and sensor-log decoding."""
