"""checkDevice — device census CLI (the reference's ``checkGPUDevice``,
reference:src/check_gpu.cpp:1-13)."""

from microimagelib_tpu.cli._common import setup_jax_cache


def main(argv=None):
    setup_jax_cache()
    from microimagelib_tpu.utils.device import query_device

    query_device(verbose=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
