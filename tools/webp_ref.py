#!/usr/bin/env python3
"""Generate libwebp-refereed VP8L conformance vectors (dev tooling).

Drives the SYSTEM libwebp (libwebp.so.7 — the reference implementation
of the public WebP spec, RFC 9649) through ctypes, in two directions:

  gen     For each planted-pixel case below, encode losslessly with
          libwebp and write <name>.webp + <name>.rgba (expected pixels)
          into src/test/resources/webp/. libwebp's own encodings
          exercise the decoder paths a home-grown encoder would not:
          predictor + color transforms, subtract-green, color cache,
          LZ77 backward references, meta prefix groups, palette
          bundling.

  check   For each src/test/resources/webp/myenc_*.webp (written by
          Vp8lSpec via the repo's own encoder), decode with libwebp and
          write <name>.rgba next to it — then the spec asserts those
          bytes equal the planted pixels, closing the loop in the
          encode direction.

Vectors are COMMITTED; tests never invoke python. Regenerate only when
cases change. Pixels are RGBA byte order (libwebp's WebPDecodeRGBA).
"""
import ctypes, os, sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "src/test/resources/webp")

lib = ctypes.CDLL("libwebp.so.7")
lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
lib.WebPEncodeLosslessRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte))]
lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
lib.WebPDecodeRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]


def encode(w, h, rgba):
    out = ctypes.POINTER(ctypes.c_ubyte)()
    n = lib.WebPEncodeLosslessRGBA(bytes(rgba), w, h, w * 4,
                                   ctypes.byref(out))
    assert n > 0, "libwebp encode failed"
    return bytes(out[i] for i in range(n))


def decode(blob):
    w, h = ctypes.c_int(), ctypes.c_int()
    p = lib.WebPDecodeRGBA(blob, len(blob), ctypes.byref(w), ctypes.byref(h))
    assert p, "libwebp decode failed"
    return w.value, h.value, bytes(p[i] for i in range(w.value * h.value * 4))


def px(w, h, f):
    """RGBA bytes from a per-(x, y) -> (r, g, b, a) formula."""
    out = bytearray()
    for y in range(h):
        for x in range(w):
            r, g, b, a = f(x, y)
            out += bytes((r & 0xff, g & 0xff, b & 0xff, a & 0xff))
    return bytes(out)


def cases():
    yield "grad_9x7", 9, 7, px(9, 7, lambda x, y:
        (x * 37 + y * 11, x * 5 + y * 3, x * 17 + y * 29, 255))
    yield "one_1x1", 1, 1, px(1, 1, lambda x, y: (200, 123, 45, 255))
    # photo-ish: smooth base + deterministic "noise" => predictor +
    # color transform + cache + LZ77 all fire at default quality
    def photo(x, y):
        n = (x * 7919 + y * 104729) % 29
        return (x + n, (x + y) // 2 + n, y + n, 255)
    yield "photo_64x48", 64, 48, px(64, 48, photo)
    # few-color => palette (color indexing) with sub-byte bundling
    yield "pal4_33x9", 33, 9, px(33, 9, lambda x, y:
        [(255, 0, 0, 255), (0, 255, 0, 255),
         (0, 0, 255, 255), (9, 9, 9, 255)][(x + y) % 4])
    yield "pal2_17x5", 17, 5, px(17, 5, lambda x, y:
        [(250, 250, 250, 255), (5, 5, 5, 255)][(x * y) % 2])
    # long runs => LZ77 with 2D distance codes
    yield "runs_40x40", 40, 40, px(40, 40, lambda x, y:
        (200, 40, 90, 255) if (y // 4) % 2 == 0 else (10, 220, 30, 255))
    # translucency => alpha channel codes
    yield "alpha_16x16", 16, 16, px(16, 16, lambda x, y:
        (x * 16, y * 16, (x ^ y) * 16, 128 + x * 4))
    # wide/odd dims
    yield "wide_301x3", 301, 3, px(301, 3, lambda x, y:
        (x % 256, (x // 2) % 256, y * 80, 255))
    # half noise / half smooth: spatially split statistics make the
    # encoder emit META PREFIX GROUPS (entropy image) + a 9-bit cache
    def split(x, y):
        if x < 200:
            s = (x * 2654435761 + y * 97 + (x * y) % 251) & 0xffffffff
            return (s & 255, (s >> 8) & 255, (s >> 16) & 255, 255)
        return ((x // 8) & 255, (y // 8) & 255, 30, 255)
    yield "meta_400x160", 400, 160, px(400, 160, split)


def gen():
    os.makedirs(OUT, exist_ok=True)
    for name, w, h, rgba in cases():
        blob = encode(w, h, rgba)
        dw, dh, back = decode(blob)
        assert (dw, dh, back) == (w, h, rgba), f"libwebp self-check {name}"
        open(os.path.join(OUT, name + ".webp"), "wb").write(blob)
        open(os.path.join(OUT, name + ".rgba"), "wb").write(rgba)
        print(f"{name}: {w}x{h} -> {len(blob)} bytes")


def check():
    for f in sorted(os.listdir(OUT)):
        if not (f.startswith("myenc_") and f.endswith(".webp")):
            continue
        blob = open(os.path.join(OUT, f), "rb").read()
        w, h, rgba = decode(blob)
        open(os.path.join(OUT, f[:-5] + ".rgba"), "wb").write(rgba)
        print(f"{f}: {w}x{h} decoded by libwebp, {len(rgba)} rgba bytes")


if __name__ == "__main__":
    {"gen": gen, "check": check}[sys.argv[1] if len(sys.argv) > 1 else "gen"]()
