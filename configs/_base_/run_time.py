# Runtime defaults (TPU-native: no NCCL/cudnn knobs; the mesh is built from
# jax.devices() at run time).
env_cfg = dict(
    platform="tpu",
    mesh=dict(axes=("data",)),
)
