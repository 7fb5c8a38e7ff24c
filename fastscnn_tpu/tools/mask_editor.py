"""Mask creation / editing.

Ports of reference:create_mask.py (polygon/brush painter with undo) and
reference:interactive_mask_editor.py (4-mode editor: fill/rect/polygon/
brush with undo/redo). The geometry core (``MaskCanvas``) is headless
and fully tested; the OpenCV window UI is a thin wrapper that requires a
display (``python -m fastscnn_tpu.tools.mask_editor --image ...``).
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image

__all__ = ["MaskCanvas", "EditorSession"]


class MaskCanvas:
    """Headless mask editing state machine with undo/redo."""

    def __init__(self, height: int, width: int, mask: np.ndarray | None = None):
        self.mask = (
            np.zeros((height, width), np.uint8) if mask is None else mask.astype(np.uint8)
        )
        self._undo: list[np.ndarray] = []
        self._redo: list[np.ndarray] = []

    def _checkpoint(self):
        self._undo.append(self.mask.copy())
        if len(self._undo) > 50:
            self._undo.pop(0)
        self._redo.clear()

    # -- operations ----------------------------------------------------------
    def brush(self, x: int, y: int, radius: int, value: int = 255, checkpoint=True):
        if checkpoint:
            self._checkpoint()
        h, w = self.mask.shape
        ys, xs = np.ogrid[:h, :w]
        circle = (xs - x) ** 2 + (ys - y) ** 2 <= radius**2
        self.mask[circle] = value

    def rectangle(self, x0: int, y0: int, x1: int, y1: int, value: int = 255):
        self._checkpoint()
        # sort BEFORE clamping: clamp-then-sort turns a right-to-left drag
        # into an empty (or negative-start, edge-wrapping) slice
        x0, x1 = sorted((x0, x1))
        y0, y1 = sorted((y0, y1))
        x0, x1 = max(0, x0), min(self.mask.shape[1], x1)
        y0, y1 = max(0, y0), min(self.mask.shape[0], y1)
        self.mask[y0:y1, x0:x1] = value

    def polygon(self, points, value: int = 255):
        """Fill a polygon given [(x, y), ...] vertices (even-odd rule)."""
        self._checkpoint()
        h, w = self.mask.shape
        pts = np.asarray(points, np.float64)
        ys, xs = np.mgrid[:h, :w]
        inside = np.zeros((h, w), bool)
        n = len(pts)
        j = n - 1
        for i in range(n):
            xi, yi = pts[i]
            xj, yj = pts[j]
            crosses = ((yi > ys) != (yj > ys)) & (
                xs < (xj - xi) * (ys - yi) / (yj - yi + 1e-12) + xi
            )
            inside ^= crosses
            j = i
        self.mask[inside] = value

    def flood_fill(self, x: int, y: int, value: int = 255):
        """4-connected flood fill from (x, y) over the seed's current value."""
        self._checkpoint()
        target = self.mask[y, x]
        if target == value:
            return
        h, w = self.mask.shape
        stack = [(y, x)]
        while stack:
            cy, cx = stack.pop()
            if not (0 <= cy < h and 0 <= cx < w) or self.mask[cy, cx] != target:
                continue
            # fill the horizontal run
            x0 = cx
            while x0 > 0 and self.mask[cy, x0 - 1] == target:
                x0 -= 1
            x1 = cx
            while x1 < w - 1 and self.mask[cy, x1 + 1] == target:
                x1 += 1
            self.mask[cy, x0 : x1 + 1] = value
            for ny in (cy - 1, cy + 1):
                if 0 <= ny < h:
                    run = np.flatnonzero(self.mask[ny, x0 : x1 + 1] == target)
                    if len(run):
                        # push one seed per contiguous segment
                        breaks = np.flatnonzero(np.diff(run) > 1)
                        seeds = [run[0]] + [run[b + 1] for b in breaks]
                        for s in seeds:
                            stack.append((ny, x0 + int(s)))

    def clear(self):
        self._checkpoint()
        self.mask[:] = 0

    # -- history -------------------------------------------------------------
    def undo(self) -> bool:
        if not self._undo:
            return False
        self._redo.append(self.mask.copy())
        self.mask = self._undo.pop()
        return True

    def redo(self) -> bool:
        if not self._redo:
            return False
        self._undo.append(self.mask.copy())
        self.mask = self._redo.pop()
        return True

    def save(self, path: str):
        Image.fromarray(self.mask).save(path)


class EditorSession:
    """Directory-based editing session: image list, prev/next navigation,
    one :class:`MaskCanvas` per image with its existing mask auto-loaded.

    This is the headless (tested) half of the reference's interactive
    editor (reference:interactive_mask_editor.py:43-95): same image
    discovery (jpg/jpeg/png/bmp, deduped+sorted), same
    ``<mask_dir>/<image-stem>.png`` mask convention, same save semantics.
    The cv2 event loop below only translates UI events into calls here.
    """

    IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".bmp")

    def __init__(self, image_dir: str, mask_dir: str):
        self.image_dir = image_dir
        self.mask_dir = mask_dir
        self.image_files = sorted(
            {
                os.path.join(image_dir, f)
                for f in os.listdir(image_dir)
                if f.lower().endswith(self.IMAGE_EXTS)
            }
        )
        self.index = 0
        self.canvas: MaskCanvas | None = None
        self.image: np.ndarray | None = None  # HWC RGB uint8
        if self.image_files:
            self._load()

    # -- navigation -----------------------------------------------------------
    @property
    def current_image_path(self) -> str:
        return self.image_files[self.index]

    @property
    def current_mask_path(self) -> str:
        stem = os.path.splitext(os.path.basename(self.current_image_path))[0]
        return os.path.join(self.mask_dir, f"{stem}.png")

    def _load(self):
        self.image = np.array(Image.open(self.current_image_path).convert("RGB"))
        h, w = self.image.shape[:2]
        mask = None
        if os.path.exists(self.current_mask_path):
            m = Image.open(self.current_mask_path).convert("L")
            if m.size != (w, h):  # PIL size is (W, H)
                m = m.resize((w, h), Image.NEAREST)
            mask = np.array(m, np.uint8)
        self.canvas = MaskCanvas(h, w, mask)

    def next(self) -> bool:
        """Advance to the next image; False when already at the last one
        (matching the reference's boundary behavior, :353-359)."""
        if self.index + 1 >= len(self.image_files):
            return False
        self.index += 1
        self._load()
        return True

    def prev(self) -> bool:
        if self.index == 0:
            return False
        self.index -= 1
        self._load()
        return True

    def save(self) -> str:
        os.makedirs(self.mask_dir, exist_ok=True)
        self.canvas.save(self.current_mask_path)
        return self.current_mask_path

    def overlay(self, color=(0, 200, 0), alpha=0.5) -> np.ndarray:
        """Painted-region overlay for display (RGB uint8)."""
        out = self.image.copy()
        sel = self.canvas.mask > 0
        out[sel] = ((1 - alpha) * out[sel] + alpha * np.asarray(color)).astype(np.uint8)
        return out


def _interactive(image_path: str, mask_path: str):  # pragma: no cover - needs display
    import cv2

    img = cv2.imread(image_path)
    canvas = MaskCanvas(img.shape[0], img.shape[1])
    if os.path.exists(mask_path):
        # np.asarray over PIL is a read-only view; copy so strokes can write
        canvas.mask = np.array(Image.open(mask_path).convert("L"), np.uint8)
    mode = {"name": "brush", "size": 20, "down": False, "value": 255}
    poly: list = []

    def on_mouse(event, x, y, flags, param):
        if event == cv2.EVENT_LBUTTONDOWN:
            mode["down"] = True
            if mode["name"] == "brush":
                canvas.brush(x, y, mode["size"], mode["value"])
            elif mode["name"] == "fill":
                canvas.flood_fill(x, y, mode["value"])
            elif mode["name"] == "polygon":
                poly.append((x, y))
        elif event == cv2.EVENT_MOUSEMOVE and mode["down"] and mode["name"] == "brush":
            canvas.brush(x, y, mode["size"], mode["value"], checkpoint=False)
        elif event == cv2.EVENT_LBUTTONUP:
            mode["down"] = False

    cv2.namedWindow("mask editor")
    cv2.setMouseCallback("mask editor", on_mouse)
    print("keys: b=brush f=fill p=polygon(ENTER closes) e=eraser-toggle "
          "+/-=size u=undo r=redo c=clear s=save q=quit")
    while True:
        overlay = img.copy()
        overlay[canvas.mask > 0] = (
            0.5 * overlay[canvas.mask > 0] + np.array([0, 127, 0])
        ).astype(np.uint8)
        cv2.imshow("mask editor", overlay)
        key = cv2.waitKey(30) & 0xFF
        if key == ord("q"):
            break
        elif key == ord("b"):
            mode["name"] = "brush"
        elif key == ord("f"):
            mode["name"] = "fill"
        elif key == ord("p"):
            mode["name"] = "polygon"
            poly.clear()
        elif key == 13 and mode["name"] == "polygon" and len(poly) >= 3:
            canvas.polygon(poly, mode["value"])
            poly.clear()
        elif key == ord("e"):
            mode["value"] = 0 if mode["value"] else 255
        elif key in (ord("+"), ord("=")):
            mode["size"] = min(100, mode["size"] + 5)
        elif key == ord("-"):
            mode["size"] = max(2, mode["size"] - 5)
        elif key == ord("u"):
            canvas.undo()
        elif key == ord("r"):
            canvas.redo()
        elif key == ord("c"):
            canvas.clear()
        elif key == ord("s"):
            canvas.save(mask_path)
            print(f"saved {mask_path}")
    cv2.destroyAllWindows()


def _interactive_session(image_dir: str, mask_dir: str):  # pragma: no cover - needs display
    """Directory session with the reference editor's full key surface
    (reference:interactive_mask_editor.py:369-435): modes f/r/p/b,
    left-click paints / right-click erases, polygon closes on right
    click, u / Ctrl+Z undo, Ctrl+Y redo, s save, n next, ',' prev,
    +/- brush size, q/ESC quit."""
    import cv2

    sess = EditorSession(image_dir, mask_dir)
    if not sess.image_files:
        print(f"no images found in {image_dir}")
        return
    mode = {"name": "fill", "size": 10, "down": False, "value": 255, "start": None}
    poly: list = []
    win = "mask editor"

    def on_mouse(event, x, y, flags, param):
        c = sess.canvas
        paint = {"L": 255, "R": 0}
        button = (
            "L" if event in (cv2.EVENT_LBUTTONDOWN, cv2.EVENT_LBUTTONUP)
            else "R" if event in (cv2.EVENT_RBUTTONDOWN, cv2.EVENT_RBUTTONUP)
            else None
        )
        if event in (cv2.EVENT_LBUTTONDOWN, cv2.EVENT_RBUTTONDOWN):
            mode["down"], mode["value"] = True, paint[button]
            if mode["name"] == "fill":
                c.flood_fill(x, y, mode["value"])
            elif mode["name"] == "brush":
                c.brush(x, y, mode["size"], mode["value"])
            elif mode["name"] == "rect":
                mode["start"] = (x, y)
            elif mode["name"] == "polygon":
                if button == "L":
                    poly.append((x, y))
                elif len(poly) >= 3:  # right click closes the polygon
                    c.polygon(poly, 255)
                    poly.clear()
        elif event == cv2.EVENT_MOUSEMOVE and mode["down"] and mode["name"] == "brush":
            c.brush(x, y, mode["size"], mode["value"], checkpoint=False)
        elif event in (cv2.EVENT_LBUTTONUP, cv2.EVENT_RBUTTONUP):
            mode["down"] = False
            if mode["name"] == "rect" and mode["start"] is not None:
                x0, y0 = mode["start"]
                c.rectangle(x0, y0, x, y, mode["value"])
                mode["start"] = None

    cv2.namedWindow(win)
    cv2.setMouseCallback(win, on_mouse)
    print("keys: f=fill r=rect p=polygon b=brush | left=paint right=erase | "
          "u/Ctrl+Z=undo Ctrl+Y=redo s=save n=next ,=prev +/-=size q/ESC=quit")
    while True:
        hdr = (f"[{sess.index + 1}/{len(sess.image_files)}] "
               f"{os.path.basename(sess.current_image_path)}  mode={mode['name']} "
               f"size={mode['size']}")
        disp = cv2.cvtColor(sess.overlay(), cv2.COLOR_RGB2BGR)
        cv2.putText(disp, hdr, (8, 22), cv2.FONT_HERSHEY_SIMPLEX, 0.6, (0, 255, 255), 1)
        cv2.imshow(win, disp)
        key = cv2.waitKey(30) & 0xFF
        if key in (ord("q"), 27):
            break
        elif key == ord("f"):
            mode["name"] = "fill"
        elif key == ord("r"):
            mode["name"] = "rect"
        elif key == ord("p"):
            mode["name"] = "polygon"
            poly.clear()
        elif key == ord("b"):
            mode["name"] = "brush"
        elif key in (ord("u"), 26):  # 26 == Ctrl+Z
            sess.canvas.undo()
        elif key == 25:  # Ctrl+Y
            sess.canvas.redo()
        elif key in (ord("+"), ord("=")):
            mode["size"] = min(100, mode["size"] + 2)
        elif key == ord("-"):
            mode["size"] = max(1, mode["size"] - 2)
        elif key == ord("s"):
            print(f"saved {sess.save()}")
        elif key == ord("n"):
            print("" if sess.next() else "already at the last image")
        elif key == ord(","):
            print("" if sess.prev() else "already at the first image")
    cv2.destroyAllWindows()


def main(argv=None):
    parser = argparse.ArgumentParser(description="interactive mask editor")
    parser.add_argument("--image", default=None, help="edit one image's mask")
    parser.add_argument("--mask", default=None)
    parser.add_argument("--images-dir", default=None,
                        help="directory session with n/, navigation "
                             "(reference interactive_mask_editor.py surface)")
    parser.add_argument("--masks-dir", default=None)
    args = parser.parse_args(argv)
    if args.images_dir:
        _interactive_session(args.images_dir, args.masks_dir or args.images_dir)
    elif args.image:
        mask_path = args.mask or os.path.splitext(args.image)[0] + "_mask.png"
        _interactive(args.image, mask_path)
    else:
        parser.error("one of --image or --images-dir is required")


if __name__ == "__main__":
    main()
