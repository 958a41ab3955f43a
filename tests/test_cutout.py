"""Polygon/MBR cutout with rotation (reference: pagexml/reader.py:283-391)."""

import numpy as np

from calamari_spark.operators.cutout import (
    CutMode,
    _rotation_matrix,
    _warp_affine,
    cutout,
    fill_poly_mask,
    min_area_rect_angle,
    parse_coords,
)

WHITE = 255


def _page(h=160, w=240):
    return np.full((h, w), WHITE, dtype=np.uint8)


def _coords(pts):
    return " ".join(f"{int(x)},{int(y)}" for x, y in pts)


def test_polygon_mask_excludes_outside_pixels():
    page = _page()
    page[:, :] = 40  # dark everywhere: outside-polygon pixels must become cval
    # non-axis-aligned quadrilateral (a parallelogram)
    poly = [(30, 50), (120, 30), (140, 80), (50, 100)]
    cut = cutout(page, _coords(poly), mode=CutMode.POLYGON, cval=WHITE)
    assert cut.shape == (71, 111)  # bbox of the polygon
    # corners of the bbox lie outside the tilted polygon -> masked to cval
    assert cut[0, 0] == WHITE and cut[-1, -1] == WHITE
    assert cut[0, -1] == WHITE and cut[-1, 0] == WHITE
    # the polygon centroid is inside -> original pixel survives
    assert cut[cut.shape[0] // 2, cut.shape[1] // 2] == 40
    # and the polygon area is preserved, not blanked
    assert (cut == 40).mean() > 0.5


def test_box_mode_keeps_everything_in_bbox():
    page = _page()
    page[50:60, 30:90] = 0
    poly = [(30, 50), (89, 50), (89, 59), (30, 59)]
    cut = cutout(page, _coords(poly), mode=CutMode.BOX)
    assert cut.shape == (10, 60)
    assert (cut == 0).all()


def test_default_cval_is_max_pixel():
    page = _page()
    page[40:100, 40:140] = 10
    # triangle inside the dark patch: everything outside the triangle must
    # become the max pixel of the CROP (=10 here, the reference's cval rule)
    poly = [(50, 50), (120, 50), (50, 90)]
    cut = cutout(page, _coords(poly), mode=CutMode.POLYGON)
    assert cut[-1, -1] == 10  # masked with max(cut), not a hardcoded white


def test_rotation_deskews_a_skewed_line():
    # draw a horizontal dark bar, rotate the whole page content clockwise by
    # 14 degrees, then ask cutout to correct it with angle=-(-14)... the
    # sign convention is pinned by construction: we rotate the bar with
    # _rotation_matrix(angle_cw=14) and cutout must undo it with angle=-14.
    bar = np.full((160, 240), WHITE, dtype=np.uint8)
    bar[75:85, 40:200] = 0
    M = _rotation_matrix((120, 80), 14.0)
    page = _warp_affine(bar, M, 240, 160, WHITE)
    # polygon: the bar's corners pushed through the same forward transform
    corners = np.array([[40, 75], [199, 75], [199, 84], [40, 84]], dtype=float)
    rot = corners @ M[:, :2].T + M[:, 2]
    cut = cutout(page, _coords(rot), mode=CutMode.POLYGON, angle=-14.0, cval=WHITE)
    dark_rows = np.flatnonzero((cut < 128).any(axis=1))
    # deskewed: the dark band occupies ~bar height, not the skewed envelope
    # (the skewed bbox spans |160*sin(14)| ~ 48 rows)
    assert 0 < len(dark_rows) <= 16
    # un-corrected cut for comparison: dark rows span the skew envelope
    cut0 = cutout(page, _coords(rot), mode=CutMode.POLYGON, angle=0, cval=WHITE)
    dark0 = np.flatnonzero((cut0 < 128).any(axis=1))
    assert len(dark0) > 2 * len(dark_rows)


def test_auto_angle_guesses_the_skew():
    pts = np.array([[40, 75], [199, 75], [199, 84], [40, 84]], dtype=float)
    M = _rotation_matrix((120, 80), 10.0)
    rot = np.rint(pts @ M[:, :2].T + M[:, 2]).astype(np.int64)
    a = min_area_rect_angle(rot)
    angle = a - 90 if a > 45 else a
    assert abs(abs(angle) - 10.0) < 1.5


def test_mbr_mode_crops_to_min_area_box():
    page = _page()
    page[:, :] = 30
    poly = [(30, 50), (120, 30), (140, 80), (50, 100)]
    cut = cutout(page, _coords(poly), mode=CutMode.MBR, cval=WHITE)
    # MBR >= polygon: strictly more unmasked pixels than the polygon cut
    cut_poly = cutout(page, _coords(poly), mode=CutMode.POLYGON, cval=WHITE)
    assert (cut == 30).sum() >= (cut_poly == 30).sum()


def test_parse_coords_scale():
    pts = parse_coords("10,20 30,40", scale=2.0)
    assert pts.tolist() == [[20, 40], [60, 80]]


def test_fill_poly_mask_even_odd():
    mask = fill_poly_mask((10, 10), np.array([[1, 1], [8, 1], [8, 8], [1, 8]]))
    assert mask[4, 4] and mask[1, 1] and mask[8, 8]
    assert not mask[0, 0] and not mask[9, 9]


def test_cutout_lines_spark_stage(spark):
    from calamari_spark.sources.pngio import decode_png, encode_png

    page = _page()
    page[50:60, 30:90] = 0
    xml = f"""<?xml version="1.0"?>
<PcGts xmlns="http://schema.primaresearch.org/PAGE/gts/pagecontent/2019-07-15">
 <Page>
  <TextRegion id="r0" orientation="0">
   <TextLine id="l0">
    <Coords points="30,50 89,50 89,59 30,59"/>
    <TextEquiv index="0"><Unicode>hi</Unicode></TextEquiv>
   </TextLine>
  </TextRegion>
 </Page>
</PcGts>"""
    from calamari_spark.sources.pagexml import cutout_lines

    pages = spark.createDataFrame(
        [("p0", xml, bytearray(encode_png(page)))], "doc_id string, xml string, png binary"
    )
    rows = cutout_lines(pages, cut_mode="polygon").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["line_h"], r["line_w"]) == (10, 60)
    assert r["orientation"] == 0.0
    img = decode_png(bytes(r["line_png"]))
    assert (img == 0).all()


def test_polygon_with_negative_coords_masks_at_correct_offset():
    # polygon extending left of the page: crop starts at column 0 and the
    # mask must align with the CLAMPED origin, not the negative minimum
    page = _page()
    page[:, :] = 40
    poly = [(-5, 50), (59, 50), (59, 59), (-5, 59)]
    cut = cutout(page, _coords(poly), mode=CutMode.POLYGON, cval=WHITE)
    assert cut.shape == (10, 60)
    assert (cut == 40).all()  # the on-page part of the rect is fully kept
