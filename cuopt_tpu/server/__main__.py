"""Run the solver service: python -m cuopt_tpu.server [--port P]
(reference `cuopt_server`/cuopt_service.py entry)."""

import argparse


def main():
    p = argparse.ArgumentParser(prog="cuopt_tpu.server")
    p.add_argument("-p", "--port", type=int, default=5000)
    p.add_argument("-i", "--ip", default="0.0.0.0")
    p.add_argument(
        "-d", "--device-count", type=int, default=None,
        help="solver processes (one per TPU chip; reference --gpu-count)",
    )
    args = p.parse_args()
    from cuopt_tpu.server.webserver import run

    run(host=args.ip, port=args.port, n_workers=args.device_count)


if __name__ == "__main__":
    main()
