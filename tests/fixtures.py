"""Reference-shaped sales fixtures (FIXTURES.md §A): CSV fact files in
every validation variant + the three dimension tables, with the golden
semantics pinned — orphan FK rows (vanish via inner join), an incentive
tie (both rank-1 earn 1%), multi-file union."""

from __future__ import annotations

import os

SALES_HEADER = "customer_id,store_id,product_name,sales_date,sales_person_id,price,quantity,total_cost"

# (customer, store, product, date, person, price, qty, total)
VALID_ROWS_1 = [
    "1,10,quantum widget,2024-01-05,100,5.00,2,10.00",
    "1,10,quantum widget,2024-01-20,100,5.00,4,20.00",
    "2,10,flux capacitor,2024-01-11,101,7.50,2,15.00",
    "1,10,quantum widget,2024-02-03,100,5.00,1,5.00",
    "3,11,warp coil,2024-01-09,102,4.00,5,20.00",
]
VALID_ROWS_2 = [
    # the tie: persons 100 and 101 both sell 30.00 at store 10 in 2024-03
    "2,10,flux capacitor,2024-03-02,100,10.00,3,30.00",
    "1,10,quantum widget,2024-03-15,101,15.00,2,30.00",
    "3,11,warp coil,2024-03-04,102,4.00,2,8.00",
    # orphan customer (no dim row) — must vanish through the inner join
    "999,10,ghost item,2024-03-09,100,1.00,1,1.00",
]
EXTRA_COL_ROWS = [
    # + coupon_code, channel → folded into additional_column
    "2,11,warp coil,2024-02-14,102,4.00,3,12.00,SAVE10,web",
    "3,10,quantum widget,2024-02-21,100,5.00,2,10.00,NONE,store",
]

CUSTOMERS = [
    # customer_id, first, last, address, pincode, phone, joining
    (1, "Ada", "Lovelace", "1 Analytical Way", "10001", "555-0001", "2020-01-01"),
    (2, "Grace", "Hopper", "2 Compiler Ct", "10002", "555-0002", "2020-02-01"),
    (3, "Edsger", "Dijkstra", "3 Shortest Path", "10003", "555-0003", "2020-03-01"),
]
STORES = [
    # id, address, store_pincode, store_manager_name, opening, reviews
    (10, "100 Market St", "10001", "Marge Manager", "2019-01-01", "good"),
    (11, "200 Main St", "10002", "Mel Manager", "2019-06-01", "fine"),
]
SALES_TEAM = [
    # id, first, last, manager_id, is_manager, address, pincode, joining
    (100, "Alice", "Seller", 100, "Y", "9 Quota Rd", "10001", "2021-01-01"),
    (101, "Bob", "Closer", 100, "N", "8 Pipeline Ave", "10001", "2021-02-01"),
    (102, "Cara", "Deal", 100, "N", "7 Funnel Blvd", "10002", "2021-03-01"),
]


def write_sales_fixture_files(input_dir: str) -> dict[str, str]:
    """Create one file per validation variant; returns name → kind."""
    os.makedirs(input_dir, exist_ok=True)
    files = {}

    def put(name: str, lines: list[str]) -> None:
        with open(os.path.join(input_dir, name), "w") as f:
            f.write("\n".join(lines) + ("\n" if lines else ""))

    put("sales_jan.csv", [SALES_HEADER, *VALID_ROWS_1])
    files["sales_jan.csv"] = "valid"
    put("sales_mar.csv", [SALES_HEADER, *VALID_ROWS_2])
    files["sales_mar.csv"] = "valid"
    put("sales_extra.csv", [SALES_HEADER + ",coupon_code,channel", *EXTRA_COL_ROWS])
    files["sales_extra.csv"] = "valid_extra"
    put(
        "sales_missing.csv",
        ["customer_id,store_id,product_name,sales_date,sales_person_id,price,quantity",
         "1,10,widget,2024-01-01,100,5.00,1"],
    )
    files["sales_missing.csv"] = "bad_schema"
    put("sales_empty.csv", [SALES_HEADER])
    files["sales_empty.csv"] = "empty"
    put("notes.txt", ["this is not a csv"])
    files["notes.txt"] = "wrong_type"
    return files


def dim_dataframes(spark):
    customer = spark.createDataFrame(
        CUSTOMERS,
        "customer_id long, first_name string, last_name string, address string,"
        " pincode string, phone_number string, customer_joining_date string",
    )
    store = spark.createDataFrame(
        STORES,
        "id long, address string, store_pincode string, store_manager_name string,"
        " store_opening_date string, reviews string",
    )
    sales_team = spark.createDataFrame(
        SALES_TEAM,
        "id long, first_name string, last_name string, manager_id long,"
        " is_manager string, address string, pincode string, joining_date string",
    )
    return {"customer": customer, "store": store, "sales_team": sales_team}


def tiny_png(width: int = 4, height: int = 4, shade: int = 17) -> bytes:
    """A genuine spec-valid 8-bit grayscale PNG written with the stdlib
    only (signature, CRC'd IHDR/IDAT/IEND chunks, zlib-compressed
    filter-0 scanlines) — a REAL image-format fixture for the decode
    seams that works in containers without Pillow. Constant ``shade``
    so the decoded pixel stats are known exactly."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes([shade]) * width for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def tiny_pgm(pixels: bytes, width: int, height: int) -> bytes:
    """Binary PGM (P5, maxval 255) of the given top-down grayscale
    pixels — the stdlib-decodable fixture the pure decode path
    (operators/multimodal._pure_gray_decoder) parses without Pillow."""
    assert len(pixels) == width * height
    return b"P5\n# fixture\n%d %d\n255\n" % (width, height) + pixels


def tiny_ppm(rgb: bytes, width: int, height: int) -> bytes:
    """Binary PPM (P6, maxval 255) of the given top-down RGB triplets."""
    assert len(rgb) == 3 * width * height
    return b"P6\n%d %d\n255\n" % (width, height) + rgb


def tiny_bmp_gray8(pixels: bytes, width: int, height: int) -> bytes:
    """Uncompressed 8-bit BMP with an identity grayscale palette,
    bottom-up rows padded to 4 bytes — the SAME pixels as ``tiny_pgm``
    through a second genuine container, so re-encode invariance of the
    perceptual hash is testable without any codec library."""
    import struct

    assert len(pixels) == width * height
    stride = (width + 3) & ~3
    palette = b"".join(bytes((v, v, v, 0)) for v in range(256))
    rows = b"".join(
        pixels[y * width : (y + 1) * width].ljust(stride, b"\x00")
        for y in reversed(range(height))
    )
    off = 14 + 40 + len(palette)
    header = struct.pack("<2sIHHI", b"BM", off + len(rows), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 8, 0, len(rows), 2835, 2835, 256, 0
    )
    return header + info + palette + rows
