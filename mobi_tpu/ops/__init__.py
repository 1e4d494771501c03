from mobi_tpu.ops.schedules import (
    DiffusionSchedule,
    SamplerTables,
    make_beta_schedule,
    make_ddim_timesteps,
    make_ddim_sampling_parameters,
    make_plms_coeffs,
    timestep_embedding,
)
from mobi_tpu.ops.distributions import DiagonalGaussian
from mobi_tpu.ops.ranges import (
    depth_normalization,
    inverse_depth_normalization,
    intensity_normalization,
    inverse_intensity_normalization,
)
