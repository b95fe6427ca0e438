#!/usr/bin/env python3
"""Prototype of the PyMuPDF-twin native text extractor (dev tool).

Purpose: reverse-engineer, AGAINST THE REFERENCE'S OWN ARTIFACTS
(single_page_debug.log funnel + NEWARK_SMART xlsx cells), the structured-text
segmentation the reference's native route (smart_extract.py:64-97,
PyMuPDF get_text("dict") spans) applied to the 242 real PDFs in
/root/reference — then port the validated rules to PdfLite.parseNative.

This is a DEV TOOL for iterating on thresholds quickly; the committed gate is
the Scala RealPdfSpec. Pure stdlib (zlib/re) — no fitz in this container.
"""
import sys, zlib, re, math

SPACE_DIST = 0.15       # MuPDF stext-device.c SPACE_DIST
SPACE_MAX_DIST = 0.8    # MuPDF SPACE_MAX_DIST
BASE_MAX_DIST = 0.8     # MuPDF BASE_MAX_DIST (baseline tolerance, in size units)


def parse_objects(data: bytes):
    objs = {}
    for m in re.finditer(rb'(\d+) (\d+) obj(.*?)endobj', data, re.S):
        num = int(m.group(1))
        body = m.group(3)
        if b'stream' in body:
            d, rest = body.split(b'stream', 1)
            rest = rest[1:] if rest[:1] == b'\n' else (rest[2:] if rest[:2] == b'\r\n' else rest)
            stream = rest.rsplit(b'endstream', 1)[0]
        else:
            d, stream = body, None
        if num not in objs:
            objs[num] = (d.decode('latin1'), stream)
    return objs


def get_stream(objs, num):
    d, s = objs[num]
    if s is None:
        return None
    if '/FlateDecode' in d:
        return zlib.decompress(s)
    return s


def ref_of(d, key):
    m = re.search(re.escape(key) + r'\s+(\d+)\s+\d+\s+R', d)
    return int(m.group(1)) if m else None


def parse_tounicode(txt):
    cmap = {}
    for sec in re.findall(r'beginbfchar(.*?)endbfchar', txt, re.S):
        for m in re.finditer(r'<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>', sec):
            src = int(m.group(1), 16)
            dsthex = m.group(2)
            dst = ''.join(chr(int(dsthex[k:k+4], 16)) for k in range(0, len(dsthex) - 3, 4))
            cmap[src] = dst
    for sec in re.findall(r'beginbfrange(.*?)endbfrange', txt, re.S):
        for m in re.finditer(r'<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>', sec):
            lo, hi = int(m.group(1), 16), int(m.group(2), 16)
            dsthex = m.group(3)
            dst = ''.join(chr(int(dsthex[k:k+4], 16)) for k in range(0, len(dsthex) - 3, 4))
            for c in range(lo, hi + 1):
                cmap[c] = dst[:-1] + chr(ord(dst[-1]) + (c - lo))
    return cmap


def parse_w_array(d):
    """CID /W array -> {cid: width}. Forms: c [w...] | c1 c2 w."""
    m = re.search(r'/W\s*\[', d)
    if not m:
        return {}
    # find matching bracket
    i = m.end()
    depth = 1
    start = i
    while i < len(d) and depth:
        if d[i] == '[':
            depth += 1
        elif d[i] == ']':
            depth -= 1
        i += 1
    body = d[start:i-1]
    widths = {}
    toks = re.findall(r'\[|\]|[-\d.]+', body)
    k = 0
    while k < len(toks):
        if toks[k] in '[]':
            k += 1
            continue
        c1 = float(toks[k])
        if k + 1 < len(toks) and toks[k+1] == '[':
            k += 2
            cid = int(c1)
            while k < len(toks) and toks[k] != ']':
                widths[cid] = float(toks[k]); cid += 1; k += 1
            k += 1
        elif k + 2 < len(toks) and toks[k+1] not in '[]' and toks[k+2] not in '[]':
            c2 = float(toks[k+1]); w = float(toks[k+2])
            for cid in range(int(c1), int(c2) + 1):
                widths[cid] = w
            k += 3
        else:
            k += 1
    return widths


class Font:
    def __init__(self, objs, num):
        d, _ = objs[num]
        self.two_byte = '/Identity-H' in d or '/Type0' in d
        tu = ref_of(d, '/ToUnicode')
        self.cmap = parse_tounicode(get_stream(objs, tu).decode('latin1')) if tu else {}
        self.widths = {}
        self.dw = 500.0
        self.asc, self.desc = 0.8, 0.2
        desc_font = d
        if '/DescendantFonts' in d:
            m = re.search(r'/DescendantFonts\s*\[\s*(\d+)\s+\d+\s+R', d)
            if m:
                desc_font = objs[int(m.group(1))][0]
        self.widths = parse_w_array(desc_font)
        m = re.search(r'/DW\s+([-\d.]+)', desc_font)
        if m:
            self.dw = float(m.group(1))
        fd = ref_of(desc_font, '/FontDescriptor')
        if fd:
            fdd = objs[fd][0]
            m = re.search(r'/Ascent\s+([-\d.]+)', fdd)
            if m:
                self.asc = float(m.group(1)) / 1000.0
            m = re.search(r'/Descent\s+([-\d.]+)', fdd)
            if m:
                self.desc = abs(float(m.group(1))) / 1000.0
        # simple-font widths
        if not self.widths and '/Widths' in d:
            fc = re.search(r'/FirstChar\s+(\d+)', d)
            arr = re.search(r'/Widths\s*\[([^\]]*)\]', d)
            if fc and arr:
                for i, w in enumerate(re.findall(r'[-\d.]+', arr.group(1))):
                    self.widths[int(fc.group(1)) + i] = float(w)

    def w0(self, code):
        return self.widths.get(code, self.dw) / 1000.0


def mat_mul(m, n):
    a, b, c, d, e, f = m
    A, B, C, D, E, F = n
    return (a*A + b*C, a*B + b*D, c*A + d*C, c*B + d*D, e*A + f*C + E, e*B + f*D + F)


def resources(objs, d):
    m = re.search(r'/Resources\s+(\d+)\s+\d+\s+R', d)
    if m:
        return objs[int(m.group(1))][0]
    i = d.find('/Resources')
    if i < 0:
        return ''
    j = d.find('<<', i)
    depth = 0
    k = j
    while k < len(d):
        if d[k:k+2] == '<<':
            depth += 1; k += 2
        elif d[k:k+2] == '>>':
            depth -= 1; k += 2
            if depth == 0:
                return d[j:k]
        else:
            k += 1
    return ''


def font_map(objs, res):
    fonts = {}
    i = res.find('/Font')
    if i < 0:
        return fonts
    sub = res[i:]
    for m in re.finditer(r'/(\w+)\s+(\d+)\s+\d+\s+R', sub[:sub.find('>>') + 2 if '>>' in sub else len(sub)]):
        if m.group(1) in ('Font',):
            continue
        try:
            fonts[m.group(1)] = Font(objs, int(m.group(2)))
        except Exception:
            pass
    return fonts


def xobj_map(objs, res):
    xo = {}
    i = res.find('/XObject')
    if i < 0:
        return xo
    sub = res[i:]
    for m in re.finditer(r'/(\w+)\s+(\d+)\s+\d+\s+R', sub):
        num = int(m.group(2))
        d, s = objs.get(num, ('', None))
        if '/Form' in d:
            xo[m.group(1)] = num
    return xo


TOKEN = re.compile(r'''
    (?P<num>[-+]?\d*\.?\d+)
  | (?P<name>/[^\s/\[\]<>()]+)
  | (?P<str>\()
  | (?P<hex><(?![<]))
  | (?P<arr>\[)
  | (?P<endarr>\])
  | (?P<dict><<|>>)
  | (?P<op>[A-Za-z'"*]+)
''', re.X)


def tokenize(content):
    i, n = 0, len(content)
    while i < n:
        ch = content[i]
        if ch in ' \t\r\n\x00':
            i += 1
            continue
        if ch == '(':
            # literal string
            sb = []
            depth = 1
            i += 1
            while i < n and depth:
                c = content[i]
                if c == '\\' and i + 1 < n:
                    nc = content[i+1]
                    if nc == 'n': sb.append('\n'); i += 2
                    elif nc == 'r': sb.append('\r'); i += 2
                    elif nc == 't': sb.append('\t'); i += 2
                    elif nc == '\n': i += 2
                    elif nc == '\r':
                        i += 2
                        if i < n and content[i] == '\n': i += 1
                    elif nc.isdigit():
                        j = i + 1; v = 0; k = 0
                        while k < 3 and j < n and content[j] in '01234567':
                            v = v * 8 + int(content[j]); j += 1; k += 1
                        sb.append(chr(v & 0xff)); i = j
                    else:
                        sb.append(nc); i += 2
                elif c == '(':
                    depth += 1; sb.append(c); i += 1
                elif c == ')':
                    depth -= 1
                    if depth: sb.append(c)
                    i += 1
                else:
                    sb.append(c); i += 1
            yield ('str', ''.join(sb))
            continue
        if ch == '<' and i + 1 < n and content[i+1] != '<':
            j = content.find('>', i)
            hexs = re.sub(r'\s', '', content[i+1:j])
            if len(hexs) % 2: hexs += '0'
            yield ('str', ''.join(chr(int(hexs[k:k+2], 16)) for k in range(0, len(hexs), 2)))
            i = j + 1
            continue
        if ch == '<':
            i += 2; yield ('op', '<<'); continue
        if ch == '>':
            i += 2; yield ('op', '>>'); continue
        if ch == '[':
            i += 1; yield ('arr', '['); continue
        if ch == ']':
            i += 1; yield ('arr', ']'); continue
        if ch == '/':
            j = i + 1
            while j < n and content[j] not in ' \t\r\n\x00/[]<>()':
                j += 1
            yield ('name', content[i+1:j]); i = j
            continue
        m = re.match(r'[-+]?(\d+\.?\d*|\.\d+)', content[i:])
        if m:
            yield ('num', float(m.group(0))); i += len(m.group(0))
            continue
        j = i
        while j < n and content[j] not in ' \t\r\n\x00/[]<>()':
            j += 1
        yield ('op', content[i:j]); i = max(j, i + 1)


class Interp:
    def __init__(self, objs, page_h):
        self.objs = objs
        self.chars = []   # (unicode, ox, oy, ex, ey, size, font_id)
        self.page_h = page_h

    def run(self, content, fonts, xobjs, ctm):
        stack = []
        tm = tlm = (1, 0, 0, 1, 0, 0)
        font = None
        fid = None
        size = 0.0
        tc = tw = ts = 0.0
        th = 1.0
        tl = 0.0
        operands = []

        def show(sraw):
            nonlocal tm
            if font is None:
                return
            codes = []
            if font.two_byte:
                for k in range(0, len(sraw) - 1, 2):
                    codes.append((ord(sraw[k]) << 8) | ord(sraw[k+1]))
            else:
                codes = [ord(c) for c in sraw]
            for code in codes:
                uni = font.cmap.get(code, chr(code))
                trm = mat_mul((size * th, 0, 0, size, 0, ts), mat_mul(tm, ctm))
                ox, oy = trm[4], trm[5]
                szx = math.hypot(trm[0], trm[1])
                w0 = font.w0(code)
                tx = (w0 * size + tc + (tw if (code == 32 and not font.two_byte) else 0)) * th
                mm = mat_mul(tm, ctm)
                ex, ey = ox + tx * mm[0], oy + tx * mm[1]
                self.chars.append((uni, ox, oy, ex, ey, szx, fid, font))
                tm = mat_mul((1, 0, 0, 1, tx, 0), tm)

        for kind, val in tokenize(content):
            if kind in ('num', 'str', 'name'):
                operands.append((kind, val))
                continue
            if kind == 'arr':
                operands.append((kind, val))
                continue
            op = val
            if op == 'q':
                stack.append(ctm)
            elif op == 'Q':
                if stack: ctm = stack.pop()
            elif op == 'cm' and len(operands) >= 6:
                nums = [v for k, v in operands[-6:] if k == 'num']
                if len(nums) == 6:
                    ctm = mat_mul(tuple(nums), ctm)
            elif op == 'BT':
                tm = tlm = (1, 0, 0, 1, 0, 0)
            elif op == 'Tf' and len(operands) >= 2:
                fid = operands[-2][1]
                font = fonts.get(fid)
                size = operands[-1][1]
            elif op in ('Td', 'TD') and len(operands) >= 2:
                txv, tyv = operands[-2][1], operands[-1][1]
                if op == 'TD': tl = -tyv
                tlm = mat_mul((1, 0, 0, 1, txv, tyv), tlm)
                tm = tlm
            elif op == 'Tm' and len(operands) >= 6:
                nums = [v for k, v in operands[-6:]]
                tm = tlm = tuple(v for k, v in operands[-6:])
            elif op == 'T*':
                tlm = mat_mul((1, 0, 0, 1, 0, -tl), tlm); tm = tlm
            elif op == 'TL' and operands:
                tl = operands[-1][1]
            elif op == 'Tc' and operands:
                tc = operands[-1][1]
            elif op == 'Tw' and operands:
                tw = operands[-1][1]
            elif op == 'Tz' and operands:
                th = operands[-1][1] / 100.0
            elif op == 'Ts' and operands:
                ts = operands[-1][1]
            elif op == 'Tj' and operands and operands[-1][0] == 'str':
                show(operands[-1][1])
            elif op in ("'", '"'):
                tlm = mat_mul((1, 0, 0, 1, 0, -tl), tlm); tm = tlm
                if operands and operands[-1][0] == 'str':
                    show(operands[-1][1])
            elif op == 'TJ':
                # operands hold the array contents: str and num alternating
                in_arr = []
                depth = 0
                for k, v in operands:
                    if k == 'arr' and v == '[':
                        depth += 1; in_arr = []
                    elif k == 'arr' and v == ']':
                        depth -= 1
                    elif depth or True:
                        in_arr.append((k, v))
                for k, v in in_arr:
                    if k == 'str':
                        show(v)
                    elif k == 'num':
                        tx = -v / 1000.0 * size * th
                        tm = mat_mul((1, 0, 0, 1, tx, 0), tm)
            elif op == 'Do' and operands and operands[-1][0] == 'name':
                name = operands[-1][1]
                if name in xobjs:
                    num = xobjs[name]
                    d, _ = self.objs[num]
                    mm = re.search(r'/Matrix\s*\[([^\]]*)\]', d)
                    fm = tuple(float(x) for x in mm.group(1).split()) if mm else (1, 0, 0, 1, 0, 0)
                    res = resources(self.objs, d)
                    sub_fonts = font_map(self.objs, res) or fonts
                    sub_xo = xobj_map(self.objs, res)
                    body = get_stream(self.objs, num).decode('latin1')
                    save = ctm
                    self.run(body, sub_fonts, sub_xo, mat_mul(fm, ctm))
                    ctm = save
            operands = []


def build_spans(chars):
    """MuPDF-ish: group chars into lines/spans, synthesize spaces."""
    spans = []
    cur = None   # dict(text=[], x0, y0(baseline), x1, size, font)
    pen = None
    for (uni, ox, oy, ex, ey, size, fid, font) in chars:
        new_line = False
        add_space = False
        if cur is None:
            new_line = True
        else:
            dist = (ox - pen[0]) / cur['size'] if cur['size'] else 0
            base = (oy - pen[1]) / cur['size'] if cur['size'] else 0
            if abs(base) > BASE_MAX_DIST:
                new_line = True
            elif dist < -SPACE_DIST:
                new_line = True
            elif dist >= SPACE_DIST and dist <= SPACE_MAX_DIST:
                add_space = True
            elif dist > SPACE_MAX_DIST:
                new_line = True
        style_change = cur is not None and (fid != cur['fid'] or abs(size - cur['size']) > 0.01)
        if new_line or style_change:
            if cur is not None:
                spans.append(cur)
            cur = {'text': [], 'x0': ox, 'base': oy, 'x1': ex, 'size': size,
                   'fid': fid, 'font': font}
            if add_space and style_change and not new_line:
                cur['text'].append(' ')
        elif add_space and (not cur['text'] or cur['text'][-1] != ' '):
            cur['text'].append(' ')
        cur['text'].append(uni)
        cur['x1'] = max(cur['x1'], ex)
        pen = (ex, ey)
    if cur is not None:
        spans.append(cur)
    items = []
    for sp in spans:
        text = ''.join(sp['text']).strip()
        if not text:
            continue
        x0 = sp['x0']
        y0 = sp['base'] - sp['font'].asc * sp['size']
        y1 = sp['base'] + sp['font'].desc * sp['size']
        items.append({
            'text': text, 'page': 1,
            'x': int(x0), 'y': int(y0),
            'width': int(sp['x1'] - x0), 'height': int(y1 - y0),
            'confidence': 100,
        })
    return items


def extract(path):
    data = open(path, 'rb').read()
    objs = parse_objects(data)
    # find page
    page = None
    for num, (d, s) in objs.items():
        if '/Type /Page' in d and '/Pages' not in d.split('/Type')[1][:10]:
            page = (num, d)
            break
    num, d = page
    mb = re.search(r'/MediaBox\s*\[\s*([-\d.]+)\s+([-\d.]+)\s+([-\d.]+)\s+([-\d.]+)', d)
    w = float(mb.group(3)) - float(mb.group(1))
    h = float(mb.group(4)) - float(mb.group(2))
    res = resources(objs, d)
    fonts = font_map(objs, res)
    xobjs = xobj_map(objs, res)
    content_ref = ref_of(d, '/Contents')
    content = get_stream(objs, content_ref).decode('latin1')
    interp = Interp(objs, h)
    base_ctm = (1, 0, 0, -1, 0, h)   # PDF user space -> top-left device space
    interp.run(content, fonts, xobjs, base_ctm)
    return build_spans(interp.chars), (w, h)


if __name__ == '__main__':
    path = sys.argv[1] if len(sys.argv) > 1 else \
        '/root/reference/DRISCOLL CF ORDERS FOR THE WEEK OF SEPTEMBER 8, 2025_page1.pdf'
    items, (w, h) = extract(path)
    print(f'page {w}x{h}: {len(items)} items (target 256)')
    for it in items[:30]:
        print(f"  ({it['x']:4d},{it['y']:4d},w={it['width']:4d},h={it['height']:3d}) {it['text'][:60]!r}")
    # run the REFERENCE slicer on them
    sys.path.insert(0, '/root/reference')
    import logging
    logging.basicConfig(level=logging.INFO)
    from slicer import TableSlicer
    box = [35, 290, 1609, 1099]
    cols = [35, 130, 217, 300, 379, 464, 598, 766, 857, 935, 1040, 1165, 1244, 1331, 1418, 1524, 1609]
    sl = TableSlicer()
    df = sl.slice_to_table(items, box, cols)
    print(f'grid: {len(df)} rows x {len(df.columns)} cols (target 10x16)')
    for _, row in df.head(12).iterrows():
        print('  |', ' | '.join(str(v)[:18] for v in row))
