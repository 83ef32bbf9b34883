"""`ut-viewer`: interactive web viewer for trained runs.

TPU-native counterpart of the reference's ``vis="viewer"`` capability
(nerfstudio's viser viewer wired into every method config —
`/root/reference/nerfuncertainty/models/laplace/laplace_config.py:55`,
`mcdropout_config.py` etc.): orbit/zoom an uncertainty-aware render of a
trained checkpoint in a browser. The reference delegates to nerfstudio's
websocket viewer; this is a dependency-free re-design — a stdlib
``http.server`` that renders frames on demand through the SAME predictive
render paths the eval CLI uses (`build_chunk_render_fn` for the nerfacto
family, `render_splat` for splats), plus a self-contained HTML/JS orbit UI
(camera math mirrors `scripts/render.py::_look_at`). Channels: rgb, depth,
and the method's uncertainty std map, jet-colorized inside a window FROZEN
at the first render of each mode — the eval artifacts' fixed
``unc_min``/``unc_max`` semantics (`eval_uncertainty.py:209-301`), so a
given std value keeps its color across poses.

Usage:
    ut-viewer --load-config outputs/run1 [--port 7007] [--downscale 4]

Then open http://localhost:7007 — drag to orbit, wheel to zoom, buttons to
switch rgb/depth/std.
"""

from __future__ import annotations

import argparse
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from uncertainty_nerf_gs_tpu.cameras.cameras import Cameras

from uncertainty_nerf_gs_tpu.utils.images import colorize, to_u8

_STD_KEYS = ("rgb_std", "uncertainty")  # nerfacto-family / active-splat


def _orbit_from_cameras(base) -> tuple[list[float], float]:
    """Initial orbit (center, radius) from a camera set: orbit CENTER is
    the least-squares intersection of the cameras' optical axes (the point
    they look at), not the mean camera position — the cameras sit on a
    shell AROUND the scene, so their mean is hollow."""
    pos = np.asarray(base.camera_to_worlds[:, :3, 3])
    fwd = -np.asarray(base.camera_to_worlds[:, :3, 2])  # OpenGL -z
    fwd = fwd / np.linalg.norm(fwd, axis=1, keepdims=True)
    # sum_i (I - d_i d_i^T) c = sum_i (I - d_i d_i^T) p_i
    A = np.zeros((3, 3))
    b = np.zeros(3)
    for p, d in zip(pos, fwd):
        M = np.eye(3) - np.outer(d, d)
        A += M
        b += M @ p
    center = np.linalg.lstsq(A, b, rcond=None)[0]
    radius = float(np.linalg.norm(pos - center, axis=1).mean())
    return center.tolist(), radius


class ViewerState:
    """Loads a run and renders arbitrary poses through the method's own
    predictive path. Thread-safe via a render lock (XLA launches are
    serialized anyway on one chip)."""

    def __init__(self, run_dir: Path | list[Path], downscale: int = 4,
                 mc_samples: int = 10, laplace_samples: int = 20):
        from uncertainty_nerf_gs_tpu.scripts.eval_uncertainty import (
            _eval_cameras_and_images,
            _load_run,
            build_chunk_render_fn,
            build_ensemble_chunk_fn,
            build_ensemble_splat_render_cam,
        )

        run_dirs = [Path(d) for d in (
            run_dir if isinstance(run_dir, (list, tuple)) else [run_dir]
        )]
        self.run_dir = run_dirs[0]
        loaded = [_load_run(d) for d in run_dirs]
        trainers = [t for t, _, _, _ in loaded]
        self.trainer, self.spec, run_cfg, self.step = loaded[0]
        self.num_members = len(trainers)
        eval_outputs, _ = _eval_cameras_and_images(run_cfg)
        base = eval_outputs.cameras
        self.base_cameras = base
        self.width = max(16, base.width // downscale)
        self.height = max(16, base.height // downscale)
        scale_x = self.width / base.width
        scale_y = self.height / base.height
        self.fx = float(base.fx[0]) * scale_x
        self.fy = float(base.fy[0]) * scale_y
        self.cx = self.width / 2.0
        self.cy = self.height / 2.0
        self.lock = threading.Lock()
        self._windows: dict[str, tuple[float, float]] = {}

        self._splat_render_cam = None
        self.chunk_fn = None
        if self.num_members > 1:  # eval-time deep ensemble (M run dirs)
            if self.spec.family == "splatfacto":
                self._splat_render_cam = build_ensemble_splat_render_cam(
                    trainers, self.width, self.height
                )
            else:
                self.chunk_fn = build_ensemble_chunk_fn(trainers)
        elif self.spec.family != "splatfacto":
            self.chunk_fn = build_chunk_render_fn(
                self.trainer, self.spec, self.run_dir,
                mc_samples=mc_samples, laplace_samples=laplace_samples,
            )

        self.center, self.radius = _orbit_from_cameras(base)
        probe = self.render_pose(np.asarray(
            base.camera_to_worlds[0], np.float32))
        self.modes = ["rgb"] + (["depth"] if "depth" in probe else []) + [
            k for k in _STD_KEYS if k in probe
        ] + [  # ensemble decomposition: epistemic vs aleatoric variance
            k for k in ("rgb_var_epi", "rgb_var_alea") if k in probe
        ]

    # ---- rendering ------------------------------------------------------
    def render_pose(self, c2w: np.ndarray) -> dict[str, np.ndarray]:
        """Render one frame at an OpenGL (3, 4) camera-to-world pose."""
        c2w = jnp.asarray(c2w, jnp.float32)
        with self.lock:
            if self._splat_render_cam is not None:  # splat ensemble
                out = self._splat_render_cam(
                    c2w, jnp.float32(self.fx), jnp.float32(self.fy),
                    jnp.float32(self.cx), jnp.float32(self.cy),
                )
                return {k: np.asarray(v) for k, v in out.items()}
            if self.spec.family == "splatfacto":
                from uncertainty_nerf_gs_tpu.models import splatfacto as sf

                out = sf.render_splat(
                    self.trainer.params, self.trainer.splat_state.alive,
                    c2w, self.fx, self.fy, self.cx, self.cy,
                    self.width, self.height, self.trainer.config,
                    sh_deg=self.trainer.config.sh_degree,
                    background=sf.fixed_background(self.trainer.config),
                )
                return {
                    k: np.asarray(v) for k, v in out.items()
                    if k not in ("radii", "visible")
                }
            from uncertainty_nerf_gs_tpu.scripts.eval_uncertainty import (
                _nerfacto_full_image_renderer,
            )

            cams = Cameras(
                camera_to_worlds=c2w[None],
                fx=jnp.array([self.fx]), fy=jnp.array([self.fy]),
                cx=jnp.array([self.cx]), cy=jnp.array([self.cy]),
                width=self.width, height=self.height,
            )
            render = _nerfacto_full_image_renderer(
                self.trainer, self.chunk_fn, cams
            )
            return {k: np.asarray(v) for k, v in render(0).items()}

    def render_png(self, c2w: np.ndarray, mode: str) -> bytes:
        outs = self.render_pose(c2w)
        if mode not in outs:
            raise KeyError(f"mode {mode!r} not in {sorted(outs)}")
        arr = outs[mode]
        if mode == "rgb":
            img = to_u8(arr)
        else:
            # freeze the colormap window at the first render of each mode
            # (fixed unc_min/unc_max semantics: stable colors across poses)
            win = self._windows.get(mode)
            if win is None:
                x = np.asarray(arr, np.float32)
                x = x.mean(-1) if x.ndim == 3 else x
                win = (float(np.nanmin(x)), float(np.nanmax(x)))
                self._windows[mode] = win
            img = colorize(arr, lo=win[0], hi=win[1])
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        return buf.getvalue()

    def info(self) -> dict:
        return {
            "method": self.spec.name,
            "num_members": self.num_members,
            "step": self.step,
            "width": self.width,
            "height": self.height,
            "modes": self.modes,
            "center": self.center,
            "radius": self.radius,
        }


class LiveViewerState(ViewerState):
    """Training-time live viewer over an in-progress trainer.

    The reference runs nerfstudio's viser viewer DURING training
    (``vis="viewer"``, `laplace_config.py:55`); this serves the same
    orbit UI against the live trainer state — every frame renders from
    the CURRENT params (the jitted render closure takes params as an
    argument, so no recompile per step). Enabled by
    ``unc-train --viewer-port N``; renders share the chip with training
    launches (JAX dispatch is thread-safe; frames just interleave)."""

    def __init__(self, trainer, spec, downscale: int = 4):
        self.trainer = trainer
        self.spec = spec
        self.num_members = 1
        self.run_dir = None
        base = trainer.cameras
        self.base_cameras = base
        self.width = max(16, base.width // downscale)
        self.height = max(16, base.height // downscale)
        self.fx = float(base.fx[0]) * (self.width / base.width)
        self.fy = float(base.fy[0]) * (self.height / base.height)
        self.cx = self.width / 2.0
        self.cy = self.height / 2.0
        self.lock = threading.Lock()
        self._windows = {}
        self._splat_render_cam = None
        self.chunk_fn = None
        if spec.family != "splatfacto":
            model = trainer.model

            @jax.jit
            def live_chunk(params, rb):
                return model.apply(
                    {"params": params}, rb, train=False,
                    use_average_appearance=True,
                )

            def chunk_fn(rb):
                params = {
                    k: v for k, v in self.trainer.state.params.items()
                    if k != "camera_opt"
                }
                return live_chunk(params, rb)

            self.chunk_fn = chunk_fn
        self.center, self.radius = _orbit_from_cameras(base)
        probe = self.render_pose(
            np.asarray(base.camera_to_worlds[0], np.float32)
        )
        self.modes = ["rgb"] + (["depth"] if "depth" in probe else []) + [
            k for k in _STD_KEYS if k in probe
        ]

    @property
    def step(self) -> int:  # live: info() reports the current train step
        t = self.trainer
        return int(t.step if hasattr(t, "step") else t.state.step)

    @step.setter
    def step(self, value):  # ViewerState's ctor assigns; live ignores it
        pass

    def render_png(self, c2w: np.ndarray, mode: str) -> bytes:
        # the std/depth value range moves during training — re-window
        # every frame instead of freezing at the first render
        self._windows.pop(mode, None)
        return super().render_png(c2w, mode)


_PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>ut-viewer</title>
<style>
 body { margin:0; background:#111; color:#ddd; font:13px sans-serif; }
 #bar { padding:6px 10px; background:#1c1c1c; display:flex; gap:8px;
        align-items:center; }
 #bar button { background:#333; color:#ddd; border:1px solid #555;
               padding:3px 10px; cursor:pointer; }
 #bar button.active { background:#2a6; color:#fff; }
 #view { display:block; margin:12px auto; image-rendering:pixelated;
         cursor:grab; border:1px solid #333; }
 #stat { margin-left:auto; opacity:.7 }
</style></head><body>
<div id="bar"><b>ut-viewer</b><span id="modes"></span>
 <span id="stat"></span></div>
<img id="view" draggable="false">
<script>
let info=null, az=0.6, el=0.35, radius=1, center=[0,0,0], mode="rgb";
let busy=false, dirty=false;
function c2w(){
  const ca=Math.cos(az), sa=Math.sin(az), ce=Math.cos(el), se=Math.sin(el);
  const o=[center[0]+radius*ca*ce, center[1]+radius*sa*ce,
           center[2]+radius*se];
  let f=[center[0]-o[0],center[1]-o[1],center[2]-o[2]];
  const nf=Math.hypot(...f); f=f.map(v=>v/nf);
  const r=[f[1], -f[0], 0];  // right = forward x up(z)
  const nr=Math.hypot(...r)||1e-8; const R=r.map(v=>v/nr);
  const u=[R[1]*f[2]-R[2]*f[1], R[2]*f[0]-R[0]*f[2], R[0]*f[1]-R[1]*f[0]];
  return [[R[0],u[0],-f[0],o[0]],[R[1],u[1],-f[1],o[1]],
          [R[2],u[2],-f[2],o[2]]];
}
async function refresh(){
  if(busy){dirty=true;return;} busy=true;
  const t0=performance.now();
  const r=await fetch("/render",{method:"POST",
    headers:{"content-type":"application/json"},
    body:JSON.stringify({c2w:c2w(),mode:mode})});
  const b=await r.blob();
  const v=document.getElementById("view");
  if(v.src) URL.revokeObjectURL(v.src);
  v.src=URL.createObjectURL(b);
  document.getElementById("stat").textContent=
    mode+" · "+((performance.now()-t0)|0)+" ms";
  busy=false; if(dirty){dirty=false; refresh();}
}
async function init(){
  info=await (await fetch("/info")).json();
  center=info.center; radius=info.radius;
  const v=document.getElementById("view");
  v.width=info.width*4; v.height=info.height*4;
  const m=document.getElementById("modes");
  info.modes.forEach(k=>{
    const b=document.createElement("button"); b.textContent=k;
    if(k===mode) b.className="active";
    b.onclick=()=>{mode=k;
      m.querySelectorAll("button").forEach(x=>x.className="");
      b.className="active"; refresh();};
    m.appendChild(b);
  });
  let drag=null;
  v.onmousedown=e=>{drag=[e.clientX,e.clientY]; e.preventDefault();};
  window.onmouseup=()=>{drag=null;};
  window.onmousemove=e=>{
    if(!drag) return;
    az-=(e.clientX-drag[0])*0.01; el+=(e.clientY-drag[1])*0.01;
    el=Math.max(-1.4,Math.min(1.4,el)); drag=[e.clientX,e.clientY];
    refresh();
  };
  v.onwheel=e=>{radius*=Math.exp(e.deltaY*0.001); e.preventDefault();
    refresh();};
  refresh();
}
init();
</script></body></html>
"""


def make_handler(state: ViewerState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("content-type", ctype)
            self.send_header("content-length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path in ("/", "/index.html"):
                self._send(200, _PAGE.encode(), "text/html")
            elif self.path == "/info":
                self._send(200, json.dumps(state.info()).encode(),
                           "application/json")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            if self.path != "/render":
                self._send(404, b"not found", "text/plain")
                return
            try:
                n = int(self.headers.get("content-length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                c2w = np.asarray(req["c2w"], np.float32).reshape(3, 4)
                png = state.render_png(c2w, req.get("mode", "rgb"))
            except Exception as e:  # malformed body/pose/mode -> 400, not a
                self._send(400, str(e).encode(), "text/plain")  # dead socket
                return
            self._send(200, png, "image/png")

    return Handler


def serve(state: ViewerState, host: str = "127.0.0.1", port: int = 7007):
    server = ThreadingHTTPServer((host, port), make_handler(state))
    return server


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description="interactive run viewer")
    ap.add_argument("--load-config", action="append", required=True,
                    help="trained run dir (repeat for an eval-time "
                         "ensemble: combined mean + epi/alea std modes)")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=7007)
    ap.add_argument("--downscale", type=int, default=4,
                    help="render at eval resolution / downscale")
    ap.add_argument("--mc-samples", type=int, default=10)
    ap.add_argument("--laplace-samples", type=int, default=20)
    args = ap.parse_args(argv)

    state = ViewerState([Path(d) for d in args.load_config],
                        downscale=args.downscale,
                        mc_samples=args.mc_samples,
                        laplace_samples=args.laplace_samples)
    server = serve(state, args.host, args.port)
    print(f"ut-viewer: {state.spec.name} step {state.step} — "
          f"http://{args.host}:{server.server_address[1]} "
          f"({state.width}x{state.height}, modes {state.modes})")
    server.serve_forever()


if __name__ == "__main__":
    main()
