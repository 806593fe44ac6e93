"""Pipeline compositions and the driver-facing query registry."""
