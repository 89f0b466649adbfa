/* h264ref — conformance-oracle CLI around the SYSTEM libavcodec/libx264.
 *
 * This is TEST INFRASTRUCTURE ONLY: it stands in for the JM reference
 * decoder (golden YUV) and synthesizes conformance bitstreams in a
 * zero-egress container.  It is NOT part of the arrow_h264_tpu decoder.
 *
 * Usage:
 *   h264ref decode  in.264 out.yuv
 *       -> decodes Annex-B stream, writes planar YUV420 (8-bit),
 *          prints "frames W H" on stdout.
 *   h264ref encode  in.yuv WxH NFRAMES FPS out.264 [key=value ...]
 *       -> encodes raw planar YUV420 with libx264; extra args are passed
 *          as AVOptions (e.g. profile=baseline x264-params=cabac=0).
 */
#include <libavcodec/avcodec.h>
#include <libavutil/opt.h>
#include <libavutil/imgutils.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

static void die(const char *msg) { fprintf(stderr, "h264ref: %s\n", msg); exit(1); }

static void write_frame_yuv(FILE *f, AVFrame *fr) {
    for (int p = 0; p < 3; p++) {
        int w = p ? (fr->width + 1) / 2 : fr->width;
        int h = p ? (fr->height + 1) / 2 : fr->height;
        for (int y = 0; y < h; y++)
            fwrite(fr->data[p] + (size_t)y * fr->linesize[p], 1, w, f);
    }
}

static int do_decode(const char *inpath, const char *outpath) {
    FILE *fi = fopen(inpath, "rb");
    if (!fi) die("cannot open input");
    FILE *fo = fopen(outpath, "wb");
    if (!fo) die("cannot open output");

    const AVCodec *codec = avcodec_find_decoder(AV_CODEC_ID_H264);
    if (!codec) die("no h264 decoder");
    AVCodecParserContext *parser = av_parser_init(codec->id);
    AVCodecContext *ctx = avcodec_alloc_context3(codec);
    /* single-threaded for strict output determinism */
    ctx->thread_count = 1;
    if (avcodec_open2(ctx, codec, NULL) < 0) die("open decoder failed");

    AVPacket *pkt = av_packet_alloc();
    AVFrame *frame = av_frame_alloc();
    uint8_t buf[65536 + AV_INPUT_BUFFER_PADDING_SIZE];
    int nframes = 0, W = 0, H = 0;
    int eof = 0;

#define DRAIN_FRAMES() do { \
    for (;;) { \
        int r = avcodec_receive_frame(ctx, frame); \
        if (r == AVERROR(EAGAIN) || r == AVERROR_EOF) break; \
        if (r < 0) die("decode error"); \
        if (frame->format != AV_PIX_FMT_YUV420P && \
            frame->format != AV_PIX_FMT_YUVJ420P) \
            die("unexpected pixel format (want yuv420p)"); \
        W = frame->width; H = frame->height; \
        write_frame_yuv(fo, frame); \
        nframes++; \
    } } while (0)

    while (!eof) {
        size_t n = fread(buf, 1, 65536, fi);
        if (n == 0) eof = 1;
        uint8_t *data = buf;
        size_t remaining = n;
        do {
            uint8_t *out_data; int out_size;
            int used = av_parser_parse2(parser, ctx, &out_data, &out_size,
                                        data, (int)remaining,
                                        AV_NOPTS_VALUE, AV_NOPTS_VALUE, 0);
            if (used < 0) die("parse error");
            data += used; remaining -= used;
            if (out_size > 0) {
                pkt->data = out_data; pkt->size = out_size;
                if (avcodec_send_packet(ctx, pkt) < 0) die("send_packet failed");
                DRAIN_FRAMES();
            }
        } while (remaining > 0 || (eof && parser->cur_offset >= 0 && 0));
        if (eof) {
            /* keep parsing with empty input until the parser stops emitting */
            for (;;) {
                uint8_t *out_data; int out_size;
                int used = av_parser_parse2(parser, ctx, &out_data, &out_size,
                                            buf, 0, AV_NOPTS_VALUE,
                                            AV_NOPTS_VALUE, 0);
                (void)used;
                if (out_size <= 0) break;
                pkt->data = out_data; pkt->size = out_size;
                if (avcodec_send_packet(ctx, pkt) < 0) die("send_packet failed");
                DRAIN_FRAMES();
            }
            avcodec_send_packet(ctx, NULL);   /* flush delayed frames */
            DRAIN_FRAMES();
        }
    }
    printf("%d %d %d\n", nframes, W, H);
    fclose(fi); fclose(fo);
    return 0;
}

static int do_encode(int argc, char **argv) {
    if (argc < 5) die("encode args: in.yuv WxH NFRAMES FPS out.264 [k=v...]");
    const char *inpath = argv[0];
    int W, H;
    if (sscanf(argv[1], "%dx%d", &W, &H) != 2) die("bad WxH");
    int nframes = atoi(argv[2]);
    int fps = atoi(argv[3]);
    const char *outpath = argv[4];

    const AVCodec *codec = avcodec_find_encoder_by_name("libx264");
    if (!codec) die("no libx264 encoder");
    AVCodecContext *ctx = avcodec_alloc_context3(codec);
    ctx->width = W; ctx->height = H;
    ctx->pix_fmt = AV_PIX_FMT_YUV420P;
    ctx->time_base = (AVRational){1, fps};
    ctx->framerate = (AVRational){fps, 1};
    ctx->thread_count = 1;
    /* no global header -> Annex-B output with in-band SPS/PPS */
    for (int i = 5; i < argc; i++) {
        char *eq = strchr(argv[i], '=');
        if (!eq) die("option must be key=value");
        *eq = 0;
        if (av_opt_set(ctx->priv_data, argv[i], eq + 1, 0) < 0 &&
            av_opt_set(ctx, argv[i], eq + 1, 0) < 0) {
            fprintf(stderr, "h264ref: bad option %s=%s\n", argv[i], eq + 1);
            exit(1);
        }
    }
    if (avcodec_open2(ctx, codec, NULL) < 0) die("open encoder failed");

    FILE *fi = fopen(inpath, "rb");
    if (!fi) die("cannot open input yuv");
    FILE *fo = fopen(outpath, "wb");
    if (!fo) die("cannot open output");

    AVFrame *frame = av_frame_alloc();
    frame->format = ctx->pix_fmt; frame->width = W; frame->height = H;
    if (av_frame_get_buffer(frame, 0) < 0) die("frame alloc");
    AVPacket *pkt = av_packet_alloc();

    for (int i = 0; i <= nframes; i++) {
        AVFrame *f = NULL;
        if (i < nframes) {
            av_frame_make_writable(frame);
            for (int p = 0; p < 3; p++) {
                int w = p ? (W + 1) / 2 : W, h = p ? (H + 1) / 2 : H;
                for (int y = 0; y < h; y++)
                    if (fread(frame->data[p] + (size_t)y * frame->linesize[p], 1, w, fi) != (size_t)w)
                        die("short yuv read");
            }
            frame->pts = i;
            f = frame;
        }
        if (avcodec_send_frame(ctx, f) < 0) die("send_frame failed");
        for (;;) {
            int r = avcodec_receive_packet(ctx, pkt);
            if (r == AVERROR(EAGAIN) || r == AVERROR_EOF) break;
            if (r < 0) die("encode error");
            fwrite(pkt->data, 1, pkt->size, fo);
            av_packet_unref(pkt);
        }
    }
    fclose(fi); fclose(fo);
    fprintf(stderr, "encoded %d frames %dx%d -> %s\n", nframes, W, H, outpath);
    return 0;
}

int main(int argc, char **argv) {
    if (argc < 2) die("usage: h264ref decode|encode ...");
    if (!strcmp(argv[1], "decode")) {
        if (argc != 4) die("decode args: in.264 out.yuv");
        return do_decode(argv[2], argv[3]);
    }
    if (!strcmp(argv[1], "encode")) return do_encode(argc - 2, argv + 2);
    die("unknown mode");
    return 1;
}
