"""CLI entry point — the reference binary's analogue.

The reference ships a native binary whose whole main is
`pollster::block_on(run())` (/root/reference/src/main.rs:3-5): it opens
a 600x600 window on the default scene (two spheres + suzanne,
/root/reference/src/lib.rs:1244-1251,532-566) and runs the orbit-
controlled frame loop. Here:

    python -m rust_wgpu_raytracing_tpu                    # window shell
    python -m rust_wgpu_raytracing_tpu --shell server     # browser/MJPEG
    python -m rust_wgpu_raytracing_tpu --shell headless \
        --frames 10 --out frame.png                       # render + save

Scene selection: --scene reference|cube|<config.json> (the JSON schema
is SceneConfig.to_json — the config system the reference lacks,
SURVEY §5.6). Keyboard in both interactive shells is the reference's
map (WASD/arrows/Space/LShift,
/root/reference/src/circle_camera_control.rs:32-74).
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m rust_wgpu_raytracing_tpu",
        description="TPU-native ray tracer (reference: "
                    "clejacquet/rust-wgpu-raytracing)")
    p.add_argument("--scene", default="reference",
                   help="'reference' | 'cube' | path to a SceneConfig "
                        "JSON (default: the reference's live scene)")
    p.add_argument("--width", type=int, default=600,
                   help="framebuffer width (reference default 600)")
    p.add_argument("--height", type=int, default=600)
    p.add_argument("--shadows", action="store_true",
                   help="hard shadows (extension over the reference)")
    p.add_argument("--shell", choices=("window", "server", "headless"),
                   default="window",
                   help="window = tkinter desktop (winit analogue); "
                        "server = HTTP/MJPEG page (wasm analogue); "
                        "headless = render --frames then exit")
    p.add_argument("--port", type=int, default=8080,
                   help="server shell port")
    p.add_argument("--frames", type=int, default=None,
                   help="stop after N frames (all shells)")
    p.add_argument("--out", default=None,
                   help="PNG path for the final frame")
    p.add_argument("--backend", default=None,
                   choices=("oracle", "megakernel"),
                   help="frame backend (default: auto by device)")
    p.add_argument("--accel", default=None,
                   choices=("brute", "cull", "bvh"))
    p.add_argument("--variant", default=None,
                   choices=("split", "fused", "auto"),
                   help="megakernel frame program (RenderConfig.variant)")
    return p


def load_scene_config(args):
    import dataclasses as dc

    from .config import SceneConfig, cube_scene, reference_scene

    if args.scene == "reference":
        cfg = reference_scene(args.width, args.height,
                              shadows=args.shadows)
    elif args.scene == "cube":
        cfg = cube_scene(args.width, args.height, shadows=args.shadows)
    else:
        with open(args.scene) as fh:
            cfg = SceneConfig.from_json(fh.read())
        rc = dc.replace(cfg.render, width=args.width, height=args.height,
                        shadows=args.shadows or cfg.render.shadows)
        cfg = dc.replace(cfg, render=rc)
    overrides = {k: getattr(args, k) for k in ("accel", "variant")
                 if getattr(args, k) is not None}
    if overrides:
        cfg = dc.replace(cfg, render=dc.replace(cfg.render, **overrides))
    return cfg


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    cfg = load_scene_config(args)

    from .runtime.frame_loop import FrameLoop
    from .runtime.renderer import Renderer

    renderer = (Renderer(cfg, backend=args.backend) if args.backend
                else Renderer(cfg))
    loop = FrameLoop(renderer)

    if args.shell == "headless":
        for _ in range(args.frames or 1):
            loop.step()
        loop.flush()
    elif args.shell == "server":
        from .runtime.server import RenderServer

        srv = RenderServer(loop, port=args.port)
        srv.serve_async()
        print(f"serving http://127.0.0.1:{args.port}", flush=True)
        try:
            loop.run(n_frames=args.frames)
        finally:
            srv.shutdown()
    else:
        from .runtime.window import Window

        Window(renderer).run(n_frames=args.frames)

    if args.out:
        renderer.save_png(args.out)
        print(f"wrote {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
