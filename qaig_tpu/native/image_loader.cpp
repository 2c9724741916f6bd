// Native image batch loader: threaded JPEG/PNG decode + BGR conversion +
// fused (x - 127.5) / 127.5 normalize straight into a CHW float32 slab.
//
// TPU-native runtime counterpart of the reference's DataLoader worker
// processes (reference train_autoencoder.py:156-160 runs 4 worker procs
// whose only job is cv2.imread + normalize).  Pixel semantics match
// qaig_tpu/data/image_dataset.py exactly: BGR channel order, [-1, 1]
// scaling, CHW layout; the Python cv2 path stays as the fallback and the
// parity test pins bit-exact agreement.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 -pthread image_loader.cpp
//        -ljpeg -lpng -o libqaig_image.so

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct JpegErr {
    jpeg_error_mgr mgr;
    jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
    JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
    longjmp(e->jb, 1);
}

// Decode one JPEG to RGB8; returns true and fills rgb (h*w*3) on success
// with dims matching (h, w).
bool decode_jpeg(FILE* f, std::vector<uint8_t>& rgb, int h, int w) {
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_err_exit;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        return false;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;  // grayscale promoted like cv2 does
    jpeg_start_decompress(&cinfo);
    if (static_cast<int>(cinfo.output_height) != h ||
        static_cast<int>(cinfo.output_width) != w ||
        cinfo.output_components != 3) {
        jpeg_destroy_decompress(&cinfo);
        return false;
    }
    rgb.resize(static_cast<size_t>(h) * w * 3);
    while (cinfo.output_scanline < cinfo.output_height) {
        JSAMPROW row = rgb.data() +
            static_cast<size_t>(cinfo.output_scanline) * w * 3;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return true;
}

// Decode one PNG to RGB8 (16-bit stripped, palette/gray expanded, alpha
// dropped — matching cv2.imread's default IMREAD_COLOR semantics).
bool decode_png(FILE* f, std::vector<uint8_t>& rgb, int h, int w) {
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING,
                                             nullptr, nullptr, nullptr);
    if (!png) return false;
    png_infop info = png_create_info_struct(png);
    if (!info) {
        png_destroy_read_struct(&png, nullptr, nullptr);
        return false;
    }
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, nullptr);
        return false;
    }
    png_init_io(png, f);
    png_read_info(png, info);
    png_set_expand(png);          // palette/gray<8/tRNS -> 8-bit
    png_set_strip_16(png);
    png_set_strip_alpha(png);
    png_set_gray_to_rgb(png);
    png_read_update_info(png, info);
    if (static_cast<int>(png_get_image_height(png, info)) != h ||
        static_cast<int>(png_get_image_width(png, info)) != w ||
        png_get_channels(png, info) != 3) {
        png_destroy_read_struct(&png, &info, nullptr);
        return false;
    }
    rgb.resize(static_cast<size_t>(h) * w * 3);
    std::vector<png_bytep> rows(h);
    for (int y = 0; y < h; ++y)
        rows[y] = rgb.data() + static_cast<size_t>(y) * w * 3;
    png_read_image(png, rows.data());
    png_read_end(png, nullptr);
    png_destroy_read_struct(&png, &info, nullptr);
    return true;
}

// RGB8 HWC -> BGR float32 CHW normalized to [-1, 1].
void normalize_chw_bgr(const uint8_t* rgb, float* out, int h, int w) {
    const size_t plane = static_cast<size_t>(h) * w;
    float* b = out;             // BGR order: channel 0 = blue
    float* g = out + plane;
    float* r = out + 2 * plane;
    for (size_t i = 0; i < plane; ++i) {
        r[i] = (rgb[3 * i + 0] - 127.5f) / 127.5f;
        g[i] = (rgb[3 * i + 1] - 127.5f) / 127.5f;
        b[i] = (rgb[3 * i + 2] - 127.5f) / 127.5f;
    }
}

bool load_one(const char* path, float* out, int h, int w) {
    FILE* f = fopen(path, "rb");
    if (!f) return false;
    uint8_t magic[8] = {0};
    if (fread(magic, 1, 8, f) != 8) {
        fclose(f);
        return false;
    }
    rewind(f);
    std::vector<uint8_t> rgb;
    bool ok = false;
    if (magic[0] == 0xFF && magic[1] == 0xD8) {
        ok = decode_jpeg(f, rgb, h, w);
    } else if (!png_sig_cmp(magic, 0, 8)) {
        ok = decode_png(f, rgb, h, w);
    }
    fclose(f);
    if (!ok) return false;
    normalize_chw_bgr(rgb.data(), out, h, w);
    return true;
}

}  // namespace

extern "C" {

// Decode len(paths)=n images of exactly (h, w, 3) into out (n, 3, h, w)
// float32 BGR in [-1, 1].  Returns 0 on success, 100 + index of the first
// failing file otherwise (unsupported format / dim mismatch / IO error),
// letting Python fall back to the cv2 path for that batch.
int qaig_load_image_batch(const char** paths, int n, float* out,
                          int h, int w, int num_threads) {
    std::atomic<int> next(0);
    std::atomic<int> failed(-1);
    const size_t item = static_cast<size_t>(3) * h * w;
    auto worker = [&]() {
        for (;;) {
            int i = next.fetch_add(1);
            if (i >= n || failed.load() >= 0) return;
            if (!load_one(paths[i], out + item * i, h, w)) {
                int expect = -1;
                failed.compare_exchange_strong(expect, i);
                return;
            }
        }
    };
    int t = num_threads < 1 ? 1 : (num_threads > n ? n : num_threads);
    std::vector<std::thread> pool;
    for (int i = 0; i < t; ++i) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
    int bad = failed.load();
    return bad < 0 ? 0 : 100 + bad;
}

}  // extern "C"
