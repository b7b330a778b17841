/* C-API smoke driver: encodes synthetic frames through libtpu_vp9.so
 * (the same surface the FFmpeg/GStreamer plugins consume) and writes
 * an IVF that the test-suite decodes with system libvpx. */
#include "tpu_vp9_enc.h"

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

static void wr32(FILE *f, uint32_t v) { fwrite(&v, 4, 1, f); }
static void wr16(FILE *f, uint16_t v) { fwrite(&v, 2, 1, f); }

int main(int argc, char **argv) {
    const int W = 96, H = 80, N = 8;
    const char *out = argc > 1 ? argv[1] : "/tmp/capi_smoke.ivf";
    TpuVp9Encoder *enc = NULL;
    if (tpu_vp9_enc_init_handle(&enc) != TPU_VP9_OK) return 1;
    TpuVp9Config cfg;
    tpu_vp9_enc_default_config(&cfg);
    cfg.width = W;
    cfg.height = H;
    cfg.qp = 45;
    cfg.enc_mode = 9;
    cfg.intra_period = -1;
    cfg.pred_structure = 0; /* low delay: packet per frame */
    if (tpu_vp9_enc_set_parameter(enc, &cfg) != TPU_VP9_OK) return 2;
    if (tpu_vp9_enc_init(enc) != TPU_VP9_OK) return 3;

    FILE *f = fopen(out, "wb");
    if (!f) return 4;
    fwrite("DKIF", 4, 1, f);
    wr16(f, 0);
    wr16(f, 32);
    fwrite("VP90", 4, 1, f);
    wr16(f, W);
    wr16(f, H);
    wr32(f, 30);
    wr32(f, 1);
    wr32(f, N);
    wr32(f, 0);

    uint8_t *y = malloc(W * H), *u = malloc(W * H / 4),
            *v = malloc(W * H / 4);
    int got = 0;
    for (int t = 0; t < N; ++t) {
        for (int r = 0; r < H; ++r)
            for (int c = 0; c < W; ++c)
                y[r * W + c] = (uint8_t)((c * 2 + r + t * 5) & 255);
        memset(u, 100 + t, W * H / 4);
        memset(v, 140, W * H / 4);
        if (tpu_vp9_enc_send_picture(enc, y, W, u, W / 2, v, W / 2, t, 0)
            != TPU_VP9_OK)
            return 5;
        TpuVp9Packet pkt;
        while (tpu_vp9_enc_get_packet(enc, &pkt) == TPU_VP9_OK) {
            wr32(f, (uint32_t)pkt.size);
            uint64_t pts = (uint64_t)pkt.pts;
            fwrite(&pts, 8, 1, f);
            fwrite(pkt.data, 1, pkt.size, f);
            got++;
        }
    }
    tpu_vp9_enc_send_picture(enc, NULL, 0, NULL, 0, NULL, 0, 0, 0); /* EOS */
    TpuVp9Packet pkt;
    while (tpu_vp9_enc_get_packet(enc, &pkt) == TPU_VP9_OK) {
        wr32(f, (uint32_t)pkt.size);
        uint64_t pts = (uint64_t)pkt.pts;
        fwrite(&pts, 8, 1, f);
        fwrite(pkt.data, 1, pkt.size, f);
        got++;
    }
    fclose(f);
    tpu_vp9_enc_deinit(enc);
    printf("capi_smoke: %d packets -> %s\n", got, out);
    return got == N ? 0 : 6;
}
