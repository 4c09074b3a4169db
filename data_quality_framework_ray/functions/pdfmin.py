"""Minimal dependency-free PDF writer (text-only, PDF 1.4).

Replaces the reportlab dependency of the reference's report sink
(/root/reference/reporting/pdf_generator.py:78-695 builds a Platypus story;
reportlab is not in this container). Output is a spec-conformant PDF:
Helvetica base-14 font (no embedding needed), one uncompressed content
stream per page, correct xref byte offsets — opens in any viewer and is
grep-able. Only what a quality report needs: lines of text, automatic
pagination, a bold-ish heading convention (size bump).
"""

from __future__ import annotations

PAGE_W, PAGE_H = 612, 792            # US Letter, points
MARGIN = 72
LEADING = 14                          # body line height
BODY_SIZE = 10
HEAD_SIZE = 14
LINES_PER_PAGE = (PAGE_H - 2 * MARGIN) // LEADING  # 46


def _esc(s: str) -> bytes:
    """PDF literal-string escaping; non-latin-1 replaced (Helvetica is a
    WinAnsi font — full unicode needs font embedding, out of scope)."""
    b = s.encode("latin-1", "replace")
    return b.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def _page_stream(lines: list[str]) -> bytes:
    """One page's content stream: headings (lines starting '#') render at
    HEAD_SIZE, everything else at BODY_SIZE."""
    out = [b"BT", b"/F1 %d Tf" % BODY_SIZE,
           b"%d %d Td" % (MARGIN, PAGE_H - MARGIN),
           b"%d TL" % LEADING]
    size = BODY_SIZE
    for ln in lines:
        want = HEAD_SIZE if ln.startswith("#") else BODY_SIZE
        if want != size:
            out.append(b"/F1 %d Tf" % want)
            size = want
        out.append(b"(" + _esc(ln.lstrip("# ") if ln.startswith("#") else ln)
                   + b") Tj T*")
    out.append(b"ET")
    return b"\n".join(out)


def write_pdf(path: str, lines: list[str], title: str = "report") -> str:
    """Write ``lines`` of text as a paginated PDF at ``path``."""
    pages = [lines[i:i + LINES_PER_PAGE]
             for i in range(0, max(len(lines), 1), LINES_PER_PAGE)] or [[]]
    n_pages = len(pages)
    # object numbering: 1 Catalog, 2 Pages, 3 Font, then per page i:
    # (4+2i) Page, (5+2i) Contents
    objs: dict[int, bytes] = {}
    kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(n_pages))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>"
               ).encode()
    objs[3] = (b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
               b"/Encoding /WinAnsiEncoding >>")
    for i, pl in enumerate(pages):
        stream = _page_stream(pl)
        objs[4 + 2 * i] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {PAGE_W} {PAGE_H}] "
            f"/Resources << /Font << /F1 3 0 R >> >> "
            f"/Contents {5 + 2 * i} 0 R >>").encode()
        objs[5 + 2 * i] = (b"<< /Length %d >>\nstream\n" % len(stream)
                           + stream + b"\nendstream")

    buf = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(buf)
        buf += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    xref_at = len(buf)
    n_obj = max(objs) + 1
    buf += b"xref\n0 %d\n" % n_obj
    buf += b"0000000000 65535 f \n"
    for num in range(1, n_obj):
        buf += b"%010d 00000 n \n" % offsets[num]
    buf += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (n_obj, xref_at))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(bytes(buf))
    import os

    os.replace(tmp, path)
    return path
