"""Progressive accumulation sensor.

Parity target: core/Sensor.zig (f32 image + sample_count) and the
running-mean update of main.hlsl:43-51: the stored image is always the mean
of all samples so far, so accumulation can stop/resume at any count and a
"reset" is just sample_count = 0.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Sensor(NamedTuple):
    image: jnp.ndarray  # [H, W, 3] f32 running mean
    sample_count: jnp.ndarray  # scalar i32

    @staticmethod
    def create(height: int, width: int) -> "Sensor":
        return Sensor(
            image=jnp.zeros((height, width, 3), jnp.float32),
            sample_count=jnp.asarray(0, jnp.int32),
        )

    def clear(self) -> "Sensor":
        """Restart accumulation (Sensor.zig:81-83). The image needs no wipe:
        the first accumulate overwrites when sample_count == 0."""
        return self._replace(sample_count=jnp.asarray(0, jnp.int32))


def accumulate(sensor: Sensor, sample_sum: jnp.ndarray, samples_per_run: int) -> Sensor:
    """Fold `samples_per_run` new samples (their sum, [H,W,3]) into the
    running mean (main.hlsl:43-51)."""
    prior = sensor.image
    count = sensor.sample_count
    new_mean_first = sample_sum / samples_per_run
    new_mean = prior + (sample_sum - prior * samples_per_run) / (
        count + samples_per_run
    ).astype(jnp.float32)
    image = jnp.where(count == 0, new_mean_first, new_mean)
    return Sensor(image=image, sample_count=count + samples_per_run)
