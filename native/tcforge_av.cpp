// FFmpeg bridge (the libtcext/tc_avcodec.h role of the reference:
// libtc linked libavcodec when present at build time; decode_mp3.c /
// decode_a52.c / decode_dv.c / encode_lavc.c reached their codecs
// through it).  This shim exposes four small C surfaces over the
// system libavcodec/libswresample/libswscale:
//
//   tc_avad_*  audio decoder: byte stream in (parser-framed), s16
//              interleaved PCM out
//   tc_avae_*  audio encoder: s16 interleaved in, packets out
//   tc_avvd_*  video decoder: one coded frame per feed, YUV420P out
//   tc_avve_*  video encoder: YUV420P planes in, packets out
//
// Built as its own shared object so libtcforge_host.so keeps zero
// external dependencies; Python loads this lazily and gates features
// on its presence.

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/lzo.h>
#include <libavutil/opt.h>
#include <libavutil/pixdesc.h>
#include <libswresample/swresample.h>
#include <libswscale/swscale.h>
}

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct AudioDec {
    const AVCodec* codec = nullptr;
    AVCodecContext* ctx = nullptr;
    AVCodecParserContext* parser = nullptr;   // null: packet == frame
    AVPacket* pkt = nullptr;
    AVFrame* frame = nullptr;
    SwrContext* swr = nullptr;
    int out_rate = 0;
    int out_channels = 0;
    std::vector<int16_t> pcm;                 // interleaved backlog
    std::vector<uint8_t> tail;                // parser carry
    std::string err;
};

int drain_frames(AudioDec* d) {
    while (true) {
        int rc = avcodec_receive_frame(d->ctx, d->frame);
        if (rc == AVERROR(EAGAIN) || rc == AVERROR_EOF) return 0;
        if (rc < 0) { d->err = "decode error"; return -1; }
        AVFrame* f = d->frame;
        int ch = f->ch_layout.nb_channels;
        if (!d->swr) {
            d->out_rate = f->sample_rate;
            d->out_channels = ch;
            AVChannelLayout out_l;
            av_channel_layout_default(&out_l, ch);
            swr_alloc_set_opts2(&d->swr, &out_l, AV_SAMPLE_FMT_S16,
                                f->sample_rate, &f->ch_layout,
                                (AVSampleFormat)f->format,
                                f->sample_rate, 0, nullptr);
            if (!d->swr || swr_init(d->swr) < 0) {
                d->err = "swr init failed";
                return -1;
            }
        }
        size_t base = d->pcm.size();
        d->pcm.resize(base + size_t(f->nb_samples) * ch);
        uint8_t* outp = reinterpret_cast<uint8_t*>(d->pcm.data() + base);
        int got = swr_convert(d->swr, &outp, f->nb_samples,
                              const_cast<const uint8_t**>(f->extended_data),
                              f->nb_samples);
        if (got < 0) { d->err = "swr convert failed"; return -1; }
        d->pcm.resize(base + size_t(got) * ch);
        av_frame_unref(d->frame);
    }
}

struct AudioEnc {
    bool framed = false;
    AVCodecContext* ctx = nullptr;
    AVPacket* pkt = nullptr;
    AVFrame* frame = nullptr;
    SwrContext* swr = nullptr;
    int frame_size = 0;
    int channels = 0;
    std::vector<int16_t> inbuf;               // interleaved backlog
    std::vector<uint8_t> out;                 // packet bytes backlog
    int64_t next_pts = 0;
    std::string err;
};

struct VideoDec {
    const AVCodec* codec = nullptr;
    AVCodecContext* ctx = nullptr;
    AVPacket* pkt = nullptr;
    AVFrame* frame = nullptr;
    SwsContext* sws = nullptr;
    int sws_target = -1;          // AVPixelFormat the sws converts to
    int w = 0, h = 0;
    bool held = false;            // frame received but not delivered
    std::string err;
};

struct VideoEnc {
    AVCodecContext* ctx = nullptr;
    AVPacket* pkt = nullptr;
    AVFrame* frame = nullptr;
    std::vector<uint8_t> out;                 // one packet at a time
    int64_t next_pts = 0;
    FILE* stats_fp = nullptr;                 // pass-1 log sink
    std::string err;
};

static void tc_avve_free_partial(VideoEnc* e) {
    if (e->stats_fp) fclose(e->stats_fp);
    av_frame_free(&e->frame);
    av_packet_free(&e->pkt);
    avcodec_free_context(&e->ctx);
    delete e;
}

const AVCodec* find_codec(const char* name, bool encoder) {
    const AVCodec* c = encoder ? avcodec_find_encoder_by_name(name)
                               : avcodec_find_decoder_by_name(name);
    if (c) return c;
    // common aliases
    std::string n(name);
    AVCodecID id = AV_CODEC_ID_NONE;
    if (n == "mp3") id = AV_CODEC_ID_MP3;
    else if (n == "mp2") id = AV_CODEC_ID_MP2;
    else if (n == "ac3" || n == "a52") id = AV_CODEC_ID_AC3;
    else if (n == "vorbis") id = AV_CODEC_ID_VORBIS;
    else if (n == "aac") id = AV_CODEC_ID_AAC;
    else if (n == "dv" || n == "dvvideo") id = AV_CODEC_ID_DVVIDEO;
    else if (n == "theora") id = AV_CODEC_ID_THEORA;
    else if (n == "mpeg4") id = AV_CODEC_ID_MPEG4;
    else if (n == "mjpeg") id = AV_CODEC_ID_MJPEG;
    else if (n == "h264") id = AV_CODEC_ID_H264;
    else if (n == "mpeg2video") id = AV_CODEC_ID_MPEG2VIDEO;
    else if (n == "mpeg1video") id = AV_CODEC_ID_MPEG1VIDEO;
    if (id == AV_CODEC_ID_NONE) return nullptr;
    return encoder ? avcodec_find_encoder(id)
                   : avcodec_find_decoder(id);
}

}  // namespace

extern "C" {

// ------------------------------------------------------------------ //
// audio decoder

void* tc_avad_new(const char* codec_name) {
    const AVCodec* c = find_codec(codec_name, false);
    if (!c) return nullptr;
    AudioDec* d = new AudioDec();
    d->codec = c;
    d->ctx = avcodec_alloc_context3(c);
    d->pkt = av_packet_alloc();
    d->frame = av_frame_alloc();
    // parser-framed codecs (mp3/mp2/ac3 byte streams); vorbis et al
    // are fed one packet per call instead
    d->parser = av_parser_init(c->id);
    if (!d->ctx || !d->pkt || !d->frame) {
        if (d->parser) av_parser_close(d->parser);
        av_frame_free(&d->frame);
        av_packet_free(&d->pkt);
        avcodec_free_context(&d->ctx);
        delete d;
        return nullptr;
    }
    if (d->parser == nullptr) {
        // packet-mode codecs need open now (extradata may follow)
        ;
    }
    return d;
}

int tc_avad_set_extradata(void* h, const uint8_t* data, int len) {
    AudioDec* d = static_cast<AudioDec*>(h);
    av_freep(&d->ctx->extradata);      // replace-safe on a second call
    d->ctx->extradata = static_cast<uint8_t*>(
        av_mallocz(len + AV_INPUT_BUFFER_PADDING_SIZE));
    memcpy(d->ctx->extradata, data, len);
    d->ctx->extradata_size = len;
    return 0;
}

static int avad_open_if_needed(AudioDec* d) {
    if (avcodec_is_open(d->ctx)) return 0;
    if (avcodec_open2(d->ctx, d->codec, nullptr) < 0) {
        d->err = "open failed";
        return -1;
    }
    return 0;
}

int tc_avad_feed(void* h, const uint8_t* data, int len) {
    AudioDec* d = static_cast<AudioDec*>(h);
    if (avad_open_if_needed(d) < 0) return -1;
    if (!d->parser) {
        // one packet per call
        av_packet_unref(d->pkt);
        av_new_packet(d->pkt, len);
        memcpy(d->pkt->data, data, len);
        if (avcodec_send_packet(d->ctx, d->pkt) < 0) {
            d->err = "send failed";
            return -1;
        }
        return drain_frames(d);
    }
    d->tail.insert(d->tail.end(), data, data + len);
    uint8_t* p = d->tail.data();
    size_t remaining = d->tail.size();
    while (remaining > 0) {
        uint8_t* obuf = nullptr;
        int osize = 0;
        int used = av_parser_parse2(d->parser, d->ctx, &obuf, &osize,
                                    p, int(remaining), AV_NOPTS_VALUE,
                                    AV_NOPTS_VALUE, 0);
        if (used < 0) { d->err = "parse failed"; return -1; }
        p += used;
        remaining -= size_t(used);
        if (osize > 0) {
            av_packet_unref(d->pkt);
            av_new_packet(d->pkt, osize);
            memcpy(d->pkt->data, obuf, osize);
            if (avcodec_send_packet(d->ctx, d->pkt) >= 0) {
                if (drain_frames(d) < 0) return -1;
            }
        } else if (used == 0) {
            break;                    // parser wants more input
        }
    }
    d->tail.erase(d->tail.begin(), d->tail.end() - remaining);
    return 0;
}

int tc_avad_flush(void* h) {
    AudioDec* d = static_cast<AudioDec*>(h);
    if (!avcodec_is_open(d->ctx)) return 0;
    // push the parser tail through, then issue the buf_size=0 EOF
    // calls av_parser_parse2 requires to emit its internally
    // buffered final frame (mp3/mp2/ac3 last frame otherwise lost)
    if (d->parser) {
        uint8_t* p = d->tail.data();
        size_t remaining = d->tail.size();
        for (;;) {
            uint8_t* obuf = nullptr;
            int osize = 0;
            int used = av_parser_parse2(
                d->parser, d->ctx, &obuf, &osize, p, int(remaining),
                AV_NOPTS_VALUE, AV_NOPTS_VALUE, 0);
            if (used > 0 && remaining > 0) {
                size_t u = size_t(used) > remaining
                               ? remaining : size_t(used);
                p += u;
                remaining -= u;
            }
            if (osize > 0) {
                av_packet_unref(d->pkt);
                av_new_packet(d->pkt, osize);
                memcpy(d->pkt->data, obuf, osize);
                if (avcodec_send_packet(d->ctx, d->pkt) >= 0)
                    drain_frames(d);
            } else if (remaining == 0) {
                break;            // EOF call returned no packet: done
            }
        }
        d->tail.clear();
    }
    avcodec_send_packet(d->ctx, nullptr);
    return drain_frames(d);
}

int tc_avad_rate(void* h) {
    return static_cast<AudioDec*>(h)->out_rate;
}
int tc_avad_channels(void* h) {
    return static_cast<AudioDec*>(h)->out_channels;
}

int64_t tc_avad_read(void* h, int16_t* out, int64_t max_values) {
    AudioDec* d = static_cast<AudioDec*>(h);
    int64_t n = int64_t(d->pcm.size());
    if (n > max_values) n = max_values;
    memcpy(out, d->pcm.data(), size_t(n) * 2);
    d->pcm.erase(d->pcm.begin(), d->pcm.begin() + n);
    return n;
}

const char* tc_avad_err(void* h) {
    return static_cast<AudioDec*>(h)->err.c_str();
}

void tc_avad_free(void* h) {
    AudioDec* d = static_cast<AudioDec*>(h);
    if (d->parser) av_parser_close(d->parser);
    if (d->swr) swr_free(&d->swr);
    av_frame_free(&d->frame);
    av_packet_free(&d->pkt);
    avcodec_free_context(&d->ctx);
    delete d;
}

// ------------------------------------------------------------------ //
// audio encoder

void* tc_avae_new(const char* codec_name, int rate, int channels,
                  int bitrate) {
    const AVCodec* c = find_codec(codec_name, true);
    if (!c) return nullptr;
    AudioEnc* e = new AudioEnc();
    e->ctx = avcodec_alloc_context3(c);
    e->pkt = av_packet_alloc();
    e->frame = av_frame_alloc();
    e->ctx->sample_rate = rate;
    av_channel_layout_default(&e->ctx->ch_layout, channels);
    e->ctx->bit_rate = bitrate;
    // pick the codec's sample format; swr feeds it from s16
    AVSampleFormat fmt = AV_SAMPLE_FMT_S16;
    const AVSampleFormat* fmts = nullptr;
    int nf = 0;
#if LIBAVCODEC_VERSION_MAJOR >= 61
    avcodec_get_supported_config(e->ctx, c, AV_CODEC_CONFIG_SAMPLE_FORMAT,
                                 0, (const void**)&fmts, &nf);
#else
    fmts = c->sample_fmts;
#endif
    if (fmts && fmts[0] != AV_SAMPLE_FMT_NONE) {
        fmt = fmts[0];
        for (int i = 0; fmts[i] != AV_SAMPLE_FMT_NONE; i++)
            if (fmts[i] == AV_SAMPLE_FMT_S16) { fmt = AV_SAMPLE_FMT_S16; break; }
    }
    e->ctx->sample_fmt = fmt;
    // the native vorbis encoder is marked experimental
    e->ctx->strict_std_compliance = FF_COMPLIANCE_EXPERIMENTAL;
    if (avcodec_open2(e->ctx, c, nullptr) < 0) {
        av_frame_free(&e->frame);
        av_packet_free(&e->pkt);
        avcodec_free_context(&e->ctx);
        delete e;
        return nullptr;
    }
    e->frame_size = e->ctx->frame_size ? e->ctx->frame_size : 1152;
    e->channels = channels;
    if (fmt != AV_SAMPLE_FMT_S16) {
        AVChannelLayout l;
        av_channel_layout_default(&l, channels);
        swr_alloc_set_opts2(&e->swr, &l, fmt, rate, &l,
                            AV_SAMPLE_FMT_S16, rate, 0, nullptr);
        if (!e->swr || swr_init(e->swr) < 0) {
            av_frame_free(&e->frame);
            av_packet_free(&e->pkt);
            avcodec_free_context(&e->ctx);
            delete e;
            return nullptr;
        }
    }
    return e;
}

int tc_avae_frame_size(void* h) {
    return static_cast<AudioEnc*>(h)->frame_size;
}

static int avae_drain(AudioEnc* e) {
    while (true) {
        int rc = avcodec_receive_packet(e->ctx, e->pkt);
        if (rc == AVERROR(EAGAIN) || rc == AVERROR_EOF) return 0;
        if (rc < 0) { e->err = "encode error"; return -1; }
        e->out.insert(e->out.end(), e->pkt->data,
                      e->pkt->data + e->pkt->size);
        av_packet_unref(e->pkt);
    }
}

// packet-framed variant (vorbis etc. need packet boundaries):
// 4-byte big-endian length prefixes in the same backlog buffer
static int avae_drain_framed(AudioEnc* e) {
    while (true) {
        int rc = avcodec_receive_packet(e->ctx, e->pkt);
        if (rc == AVERROR(EAGAIN) || rc == AVERROR_EOF) return 0;
        if (rc < 0) { e->err = "encode error"; return -1; }
        uint32_t n = uint32_t(e->pkt->size);
        uint8_t hdr[4] = {uint8_t(n >> 24), uint8_t(n >> 16),
                          uint8_t(n >> 8), uint8_t(n)};
        e->out.insert(e->out.end(), hdr, hdr + 4);
        e->out.insert(e->out.end(), e->pkt->data,
                      e->pkt->data + e->pkt->size);
        av_packet_unref(e->pkt);
    }
}

static int avae_drain_any(AudioEnc* e) {
    return e->framed ? avae_drain_framed(e) : avae_drain(e);
}

static int avae_send_frame(AudioEnc* e, const int16_t* pcm, int ns) {
    AVFrame* f = e->frame;
    f->nb_samples = ns;
    f->format = e->ctx->sample_fmt;
    av_channel_layout_copy(&f->ch_layout, &e->ctx->ch_layout);
    f->sample_rate = e->ctx->sample_rate;
    if (av_frame_get_buffer(f, 0) < 0) { e->err = "frame buffer"; return -1; }
    if (e->swr) {
        const uint8_t* in = reinterpret_cast<const uint8_t*>(pcm);
        if (swr_convert(e->swr, f->extended_data, ns, &in, ns) < 0) {
            e->err = "swr"; return -1;
        }
    } else {
        memcpy(f->extended_data[0], pcm, size_t(ns) * e->channels * 2);
    }
    f->pts = e->next_pts;
    e->next_pts += ns;
    int rc = avcodec_send_frame(e->ctx, f);
    av_frame_unref(f);
    if (rc < 0) { e->err = "send frame"; return -1; }
    return avae_drain_any(e);
}

int tc_avae_feed(void* h, const int16_t* pcm, int64_t nsamples) {
    AudioEnc* e = static_cast<AudioEnc*>(h);
    e->inbuf.insert(e->inbuf.end(), pcm,
                    pcm + size_t(nsamples) * e->channels);
    size_t need = size_t(e->frame_size) * e->channels;
    size_t pos = 0;
    while (e->inbuf.size() - pos >= need) {
        if (avae_send_frame(e, e->inbuf.data() + pos,
                            e->frame_size) < 0)
            return -1;
        pos += need;
    }
    e->inbuf.erase(e->inbuf.begin(), e->inbuf.begin() + pos);
    return 0;
}

int tc_avae_flush(void* h) {
    AudioEnc* e = static_cast<AudioEnc*>(h);
    if (!e->inbuf.empty()) {
        // pad the trailing partial frame with silence
        size_t need = size_t(e->frame_size) * e->channels;
        e->inbuf.resize(need, 0);
        if (avae_send_frame(e, e->inbuf.data(), e->frame_size) < 0)
            return -1;
        e->inbuf.clear();
    }
    avcodec_send_frame(e->ctx, nullptr);
    return avae_drain_any(e);
}

int tc_avae_set_framed(void* h, int framed) {
    static_cast<AudioEnc*>(h)->framed = framed != 0;
    return 0;
}

int tc_avae_extradata(void* h, uint8_t* out, int maxlen) {
    AudioEnc* e = static_cast<AudioEnc*>(h);
    int n = e->ctx->extradata_size;
    if (n > maxlen) n = maxlen;
    if (n > 0) memcpy(out, e->ctx->extradata, size_t(n));
    return e->ctx->extradata_size;
}

int64_t tc_avae_read(void* h, uint8_t* out, int64_t maxbytes) {
    AudioEnc* e = static_cast<AudioEnc*>(h);
    int64_t n = int64_t(e->out.size());
    if (n > maxbytes) n = maxbytes;
    memcpy(out, e->out.data(), size_t(n));
    e->out.erase(e->out.begin(), e->out.begin() + n);
    return n;
}

const char* tc_avae_err(void* h) {
    return static_cast<AudioEnc*>(h)->err.c_str();
}

void tc_avae_free(void* h) {
    AudioEnc* e = static_cast<AudioEnc*>(h);
    if (e->swr) swr_free(&e->swr);
    av_frame_free(&e->frame);
    av_packet_free(&e->pkt);
    avcodec_free_context(&e->ctx);
    delete e;
}

// ------------------------------------------------------------------ //
// video decoder (one coded frame per feed)

void* tc_avvd_new(const char* codec_name) {
    const AVCodec* c = find_codec(codec_name, false);
    if (!c) return nullptr;
    VideoDec* d = new VideoDec();
    d->codec = c;
    d->ctx = avcodec_alloc_context3(c);
    d->pkt = av_packet_alloc();
    d->frame = av_frame_alloc();
    return d;       // open deferred until first feed (extradata)
}

int tc_avvd_set_extradata(void* h, const uint8_t* data, int len) {
    VideoDec* d = static_cast<VideoDec*>(h);
    av_freep(&d->ctx->extradata);      // replace-safe on a second call
    d->ctx->extradata = static_cast<uint8_t*>(
        av_mallocz(len + AV_INPUT_BUFFER_PADDING_SIZE));
    memcpy(d->ctx->extradata, data, len);
    d->ctx->extradata_size = len;
    return 0;
}

int tc_avvd_feed(void* h, const uint8_t* data, int len) {
    VideoDec* d = static_cast<VideoDec*>(h);
    if (!avcodec_is_open(d->ctx)
            && avcodec_open2(d->ctx, d->codec, nullptr) < 0) {
        d->err = "open failed";
        return -1;
    }
    av_packet_unref(d->pkt);
    av_new_packet(d->pkt, len);
    memcpy(d->pkt->data, data, len);
    if (avcodec_send_packet(d->ctx, d->pkt) < 0) {
        d->err = "send failed";
        return -1;
    }
    return 0;
}

// returns 1 when a frame was written, 0 when none pending, -1 error.
// chroma: 1 -> YUV420P out, 2 -> YUV422P out (full vertical
// chroma), 3 -> YUV411P out (quarter-width chroma — DV NTSC),
// 4 -> YUV444P out (full-resolution chroma)
int tc_avvd_recv2(void* h, uint8_t* y, uint8_t* u, uint8_t* v,
                  int* w, int* hh, int chroma) {
    VideoDec* d = static_cast<VideoDec*>(h);
    if (!d->held) {
        int rc = avcodec_receive_frame(d->ctx, d->frame);
        if (rc == AVERROR(EAGAIN) || rc == AVERROR_EOF) return 0;
        if (rc < 0) { d->err = "decode error"; return -1; }
    }
    AVFrame* f = d->frame;
    d->w = f->width;
    d->h = f->height;
    *w = f->width;
    *hh = f->height;
    if (y == nullptr) {              // geometry probe: hold the frame
        d->held = true;
        return 1;
    }
    d->held = false;
    AVPixelFormat target = chroma == 4 ? AV_PIX_FMT_YUV444P
                         : chroma == 3 ? AV_PIX_FMT_YUV411P
                         : chroma == 2 ? AV_PIX_FMT_YUV422P
                                       : AV_PIX_FMT_YUV420P;
    if (!d->sws || d->sws_target != target) {
        if (d->sws) sws_freeContext(d->sws);
        d->sws = sws_getContext(f->width, f->height,
                                (AVPixelFormat)f->format,
                                f->width, f->height,
                                target, SWS_BILINEAR,
                                nullptr, nullptr, nullptr);
        d->sws_target = target;
        if (!d->sws) { d->err = "sws init"; return -1; }
    }
    uint8_t* dst[4] = {y, u, v, nullptr};
    int cdiv = chroma == 4 ? 1 : chroma == 3 ? 4 : 2;
    int strides[4] = {f->width, f->width / cdiv, f->width / cdiv, 0};
    sws_scale(d->sws, f->data, f->linesize, 0, f->height, dst,
              strides);
    av_frame_unref(d->frame);
    return 1;
}

int tc_avvd_recv(void* h, uint8_t* y, uint8_t* u, uint8_t* v,
                 int* w, int* hh) {
    return tc_avvd_recv2(h, y, u, v, w, hh, 1);
}

// source chroma family after a probe recv: 3 = 4:1:1, 2 = 4:2:2,
// 1 otherwise
int tc_avvd_src_chroma(void* h) {
    VideoDec* d = static_cast<VideoDec*>(h);
    if (!d->held) return 1;
    const AVPixFmtDescriptor* dsc =
        av_pix_fmt_desc_get((AVPixelFormat)d->frame->format);
    if (!dsc) return 1;
    if (dsc->log2_chroma_h == 0 && dsc->log2_chroma_w == 0
        && dsc->nb_components >= 3) return 4;
    if (dsc->log2_chroma_h == 0 && dsc->log2_chroma_w == 2) return 3;
    return (dsc->log2_chroma_h == 0 && dsc->log2_chroma_w == 1)
        ? 2 : 1;
}

// signal end of stream: delayed frames drain via tc_avvd_recv*
int tc_avvd_flush(void* h) {
    VideoDec* d = static_cast<VideoDec*>(h);
    if (!avcodec_is_open(d->ctx)) return 0;
    avcodec_send_packet(d->ctx, nullptr);
    return 0;
}

int tc_avvd_width(void* h) { return static_cast<VideoDec*>(h)->w; }
int tc_avvd_height(void* h) { return static_cast<VideoDec*>(h)->h; }
const char* tc_avvd_err(void* h) {
    return static_cast<VideoDec*>(h)->err.c_str();
}

void tc_avvd_free(void* h) {
    VideoDec* d = static_cast<VideoDec*>(h);
    if (d->sws) sws_freeContext(d->sws);
    av_frame_free(&d->frame);
    av_packet_free(&d->pkt);
    avcodec_free_context(&d->ctx);
    delete d;
}

// ------------------------------------------------------------------ //
// video encoder (YUV420P in, packets out)

// flags: bit0 = AV_CODEC_FLAG_GLOBAL_HEADER (xiph-style codecs keep
// their header packets in extradata instead of the stream)
// pass_n: 0 single pass, 1 analysis pass (stats written to
// statsfile), 2 final pass (stats read back) — the encode_x264.c /
// encode_xvid.c -R multipass contract via AV_CODEC_FLAG_PASS1/2.
// opts: newline-separated "key=value" AVOptions applied (with
// AV_OPT_SEARCH_CHILDREN, so codec-private options resolve) before
// avcodec_open2 — the encode_x264.c/encode_xvid.c/encode_lavc.c
// x264.cfg/xvid.cfg/lavc.cfg configuration path.  Unknown keys warn
// and are skipped, mirroring tc_config_read_file's tolerance.
void* tc_avve_new4(const char* codec_name, int w, int h, int fps_num,
                   int fps_den, int bitrate, int gop, int flags,
                   int pass_n, const char* statsfile,
                   const char* opts) {
    const AVCodec* c = find_codec(codec_name, true);
    if (!c) return nullptr;
    VideoEnc* e = new VideoEnc();
    e->ctx = avcodec_alloc_context3(c);
    e->pkt = av_packet_alloc();
    e->frame = av_frame_alloc();
    e->ctx->width = w;
    e->ctx->height = h;
    e->ctx->time_base = AVRational{fps_den, fps_num};
    e->ctx->framerate = AVRational{fps_num, fps_den};
    e->ctx->pix_fmt = AV_PIX_FMT_YUV420P;
    e->ctx->bit_rate = bitrate;
    e->ctx->gop_size = gop;
    e->ctx->max_b_frames = 0;       // payload==frame for the muxers
    if (flags & 1)
        e->ctx->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    if (pass_n >= 1 && statsfile) {
        // libx264/libx265 handle the log file themselves via their
        // "stats" private option; mpegvideo-family codecs go through
        // avctx->stats_out / stats_in instead
        bool codec_owns_file =
            av_opt_set(e->ctx->priv_data, "stats", statsfile,
                       0) >= 0;
        if (pass_n == 1) {
            e->ctx->flags |= AV_CODEC_FLAG_PASS1;
            if (!codec_owns_file) {
                e->stats_fp = fopen(statsfile, "w");
                if (!e->stats_fp) {
                    tc_avve_free_partial(e);
                    return nullptr;
                }
            }
        } else {
            e->ctx->flags |= AV_CODEC_FLAG_PASS2;
            FILE* f = fopen(statsfile, "r");
            if (!f) { tc_avve_free_partial(e); return nullptr; }
            if (!codec_owns_file) {
                std::string stats;
                char buf[4096];
                size_t n;
                while ((n = fread(buf, 1, sizeof buf, f)) > 0)
                    stats.append(buf, n);
                // avcodec_close() av_freep()s stats_in -> a copy
                e->ctx->stats_in = av_strdup(stats.c_str());
            }
            fclose(f);
        }
    }
    if (opts && *opts) {
        std::string s(opts);
        size_t pos = 0;
        while (pos < s.size()) {
            size_t end = s.find('\n', pos);
            if (end == std::string::npos) end = s.size();
            std::string line = s.substr(pos, end - pos);
            pos = end + 1;
            if (line.empty()) continue;
            size_t eq = line.find('=');
            std::string key = (eq == std::string::npos)
                ? line : line.substr(0, eq);
            std::string val = (eq == std::string::npos)
                ? std::string("1") : line.substr(eq + 1);
            int ret = av_opt_set(e->ctx, key.c_str(), val.c_str(),
                                 AV_OPT_SEARCH_CHILDREN);
            if (ret < 0)
                fprintf(stderr, "[tcforge_av] %s: ignoring unknown/"
                        "invalid option '%s' = '%s'\n",
                        codec_name, key.c_str(), val.c_str());
        }
    }
    // The feed path (tc_avve_feed) only ever fills planar-YUV
    // 4:2:0 / 4:2:2 planes.  A pixel_format AVOption from lavc.cfg
    // or a module optstring that switches to anything else (gray,
    // yuv444p, nv12, ...) would make tc_avve_feed memcpy into NULL
    // or undersized plane buffers — refuse at open() instead.
    if (e->ctx->pix_fmt != AV_PIX_FMT_YUV420P &&
        e->ctx->pix_fmt != AV_PIX_FMT_YUV422P &&
        e->ctx->pix_fmt != AV_PIX_FMT_YUV411P &&
        e->ctx->pix_fmt != AV_PIX_FMT_YUV444P) {
        fprintf(stderr, "[tcforge_av] %s: unsupported pixel_format "
                "(only planar-YUV 420/422/411/444 reach the feed "
                "path)\n", codec_name);
        tc_avve_free_partial(e);
        return nullptr;
    }
    if (avcodec_open2(e->ctx, c, nullptr) < 0) {
        tc_avve_free_partial(e);
        return nullptr;
    }
    return e;
}

void* tc_avve_new3(const char* codec_name, int w, int h, int fps_num,
                   int fps_den, int bitrate, int gop, int flags,
                   int pass_n, const char* statsfile) {
    return tc_avve_new4(codec_name, w, h, fps_num, fps_den, bitrate,
                        gop, flags, pass_n, statsfile, nullptr);
}

void* tc_avve_new2(const char* codec_name, int w, int h, int fps_num,
                   int fps_den, int bitrate, int gop, int flags) {
    return tc_avve_new3(codec_name, w, h, fps_num, fps_den, bitrate,
                        gop, flags, 0, nullptr);
}

void* tc_avve_new(const char* codec_name, int w, int h, int fps_num,
                  int fps_den, int bitrate, int gop) {
    return tc_avve_new2(codec_name, w, h, fps_num, fps_den, bitrate,
                        gop, 0);
}

// chroma family of the opened encode context: 3 = 4:1:1,
// 2 = 4:2:2, 1 = 4:2:0
int tc_avve_chroma(void* h) {
    VideoEnc* e = static_cast<VideoEnc*>(h);
    const AVPixFmtDescriptor* dsc = av_pix_fmt_desc_get(e->ctx->pix_fmt);
    if (!dsc) return 1;
    if (dsc->log2_chroma_h == 0 && dsc->log2_chroma_w == 0) return 4;
    if (dsc->log2_chroma_h == 0 && dsc->log2_chroma_w == 2) return 3;
    return (dsc->log2_chroma_h == 0 && dsc->log2_chroma_w == 1)
        ? 2 : 1;
}

int tc_avve_extradata(void* h, uint8_t* out, int maxlen) {
    VideoEnc* e = static_cast<VideoEnc*>(h);
    int n = e->ctx->extradata_size;
    if (n > maxlen) n = maxlen;
    if (n > 0) memcpy(out, e->ctx->extradata, size_t(n));
    return e->ctx->extradata_size;
}

static int avve_drain(VideoEnc* e) {
    while (true) {
        int rc = avcodec_receive_packet(e->ctx, e->pkt);
        if (rc == AVERROR(EAGAIN) || rc == AVERROR_EOF) return 0;
        if (rc < 0) { e->err = "encode error"; return -1; }
        // pass-1 rate-control log: one stats_out line per packet
        // (the ffmpeg.c do_video_stats pattern)
        if (e->stats_fp && e->ctx->stats_out && e->ctx->stats_out[0])
            fputs(e->ctx->stats_out, e->stats_fp);
        // length-prefixed packets so Python can split them
        uint32_t n = uint32_t(e->pkt->size);
        uint8_t hdr[5] = {uint8_t(n >> 24), uint8_t(n >> 16),
                          uint8_t(n >> 8), uint8_t(n),
                          uint8_t((e->pkt->flags & AV_PKT_FLAG_KEY)
                                  ? 1 : 0)};
        e->out.insert(e->out.end(), hdr, hdr + 5);
        e->out.insert(e->out.end(), e->pkt->data,
                      e->pkt->data + e->pkt->size);
        av_packet_unref(e->pkt);
    }
}

int tc_avve_feed(void* h, const uint8_t* y, const uint8_t* u,
                 const uint8_t* v) {
    VideoEnc* e = static_cast<VideoEnc*>(h);
    AVFrame* f = e->frame;
    // fill planes per the context's pixel format (yuv422p reaches
    // here via the opts tier's "pixel_format=..." AVOption)
    f->format = e->ctx->pix_fmt;
    f->width = e->ctx->width;
    f->height = e->ctx->height;
    if (av_frame_get_buffer(f, 0) < 0) { e->err = "frame buffer"; return -1; }
    int w = e->ctx->width, hh = e->ctx->height;
    const AVPixFmtDescriptor* dsc = av_pix_fmt_desc_get(e->ctx->pix_fmt);
    int cw = dsc ? (w >> dsc->log2_chroma_w) : w / 2;
    int ch = dsc ? (hh >> dsc->log2_chroma_h) : hh / 2;
    for (int r = 0; r < hh; r++)
        memcpy(f->data[0] + r * f->linesize[0], y + r * w, w);
    for (int r = 0; r < ch; r++) {
        memcpy(f->data[1] + r * f->linesize[1], u + r * cw, cw);
        memcpy(f->data[2] + r * f->linesize[2], v + r * cw, cw);
    }
    f->pts = e->next_pts++;
    int rc = avcodec_send_frame(e->ctx, f);
    av_frame_unref(f);
    if (rc < 0) { e->err = "send frame"; return -1; }
    return avve_drain(e);
}

int tc_avve_flush(void* h) {
    VideoEnc* e = static_cast<VideoEnc*>(h);
    avcodec_send_frame(e->ctx, nullptr);
    return avve_drain(e);
}

int64_t tc_avve_read(void* h, uint8_t* out, int64_t maxbytes) {
    VideoEnc* e = static_cast<VideoEnc*>(h);
    int64_t n = int64_t(e->out.size());
    if (n > maxbytes) n = maxbytes;
    memcpy(out, e->out.data(), size_t(n));
    e->out.erase(e->out.begin(), e->out.begin() + n);
    return n;
}

const char* tc_avve_err(void* h) {
    return static_cast<VideoEnc*>(h)->err.c_str();
}

void tc_avve_free(void* h) {
    tc_avve_free_partial(static_cast<VideoEnc*>(h));
}

// ------------------------------------------------------------------ //
// File-level audio decode via libavformat (the import_ffmpeg.c /
// decode_dv.c audio role): open any container, pick an audio stream,
// decode to interleaved s16.

struct FmtAudio {
    AVFormatContext* fmt = nullptr;
    AVCodecContext* ctx = nullptr;
    SwrContext* swr = nullptr;
    AVPacket* pkt = nullptr;
    AVFrame* frame = nullptr;
    int stream_index = -1;
    int out_rate = 0;
    int out_channels = 0;
    bool eof = false;
    std::vector<int16_t> pcm;
    std::string err;
};

static int fmtaudio_drain(FmtAudio* d) {
    while (true) {
        int rc = avcodec_receive_frame(d->ctx, d->frame);
        if (rc == AVERROR(EAGAIN) || rc == AVERROR_EOF) return 0;
        if (rc < 0) { d->err = "decode error"; return -1; }
        AVFrame* f = d->frame;
        int ch = f->ch_layout.nb_channels;
        if (!d->swr) {
            d->out_rate = f->sample_rate;
            d->out_channels = ch;
            AVChannelLayout out_l;
            av_channel_layout_default(&out_l, ch);
            swr_alloc_set_opts2(&d->swr, &out_l, AV_SAMPLE_FMT_S16,
                                f->sample_rate, &f->ch_layout,
                                (AVSampleFormat)f->format,
                                f->sample_rate, 0, nullptr);
            if (!d->swr || swr_init(d->swr) < 0) {
                d->err = "swr init failed";
                return -1;
            }
        }
        size_t base = d->pcm.size();
        d->pcm.resize(base + size_t(f->nb_samples) * ch);
        uint8_t* outp = reinterpret_cast<uint8_t*>(d->pcm.data() + base);
        int got = swr_convert(d->swr, &outp, f->nb_samples,
                              const_cast<const uint8_t**>(f->extended_data),
                              f->nb_samples);
        if (got < 0) { d->err = "swr convert"; return -1; }
        d->pcm.resize(base + size_t(got) * ch);
        av_frame_unref(d->frame);
    }
}

void* tc_fmtaudio_open(const char* path, int track) {
    FmtAudio* d = new FmtAudio();
    if (avformat_open_input(&d->fmt, path, nullptr, nullptr) < 0) {
        delete d;
        return nullptr;
    }
    if (avformat_find_stream_info(d->fmt, nullptr) < 0) {
        avformat_close_input(&d->fmt);
        delete d;
        return nullptr;
    }
    int seen = 0;
    for (unsigned i = 0; i < d->fmt->nb_streams; i++) {
        AVStream* st = d->fmt->streams[i];
        if (st->codecpar->codec_type == AVMEDIA_TYPE_AUDIO) {
            if (seen == track) { d->stream_index = int(i); break; }
            seen++;
        }
    }
    if (d->stream_index < 0) {
        avformat_close_input(&d->fmt);
        delete d;
        return nullptr;
    }
    AVStream* st = d->fmt->streams[d->stream_index];
    const AVCodec* c = avcodec_find_decoder(st->codecpar->codec_id);
    if (!c) {
        avformat_close_input(&d->fmt);
        delete d;
        return nullptr;
    }
    d->ctx = avcodec_alloc_context3(c);
    avcodec_parameters_to_context(d->ctx, st->codecpar);
    if (avcodec_open2(d->ctx, c, nullptr) < 0) {
        avcodec_free_context(&d->ctx);
        avformat_close_input(&d->fmt);
        delete d;
        return nullptr;
    }
    d->pkt = av_packet_alloc();
    d->frame = av_frame_alloc();
    d->out_rate = st->codecpar->sample_rate;
    d->out_channels = st->codecpar->ch_layout.nb_channels;
    return d;
}

// pump until some PCM is buffered or EOF; 0 ok, -1 error
int tc_fmtaudio_pump(void* h) {
    FmtAudio* d = static_cast<FmtAudio*>(h);
    while (d->pcm.empty() && !d->eof) {
        int rc = av_read_frame(d->fmt, d->pkt);
        if (rc < 0) {
            d->eof = true;
            avcodec_send_packet(d->ctx, nullptr);
            return fmtaudio_drain(d);
        }
        if (d->pkt->stream_index == d->stream_index) {
            if (avcodec_send_packet(d->ctx, d->pkt) >= 0) {
                if (fmtaudio_drain(d) < 0) {
                    av_packet_unref(d->pkt);
                    return -1;
                }
            }
        }
        av_packet_unref(d->pkt);
    }
    return 0;
}

int tc_fmtaudio_rate(void* h) {
    return static_cast<FmtAudio*>(h)->out_rate;
}
int tc_fmtaudio_channels(void* h) {
    return static_cast<FmtAudio*>(h)->out_channels;
}
int tc_fmtaudio_eof(void* h) {
    FmtAudio* d = static_cast<FmtAudio*>(h);
    return (d->eof && d->pcm.empty()) ? 1 : 0;
}

int64_t tc_fmtaudio_read(void* h, int16_t* out, int64_t max_values) {
    FmtAudio* d = static_cast<FmtAudio*>(h);
    int64_t n = int64_t(d->pcm.size());
    if (n > max_values) n = max_values;
    memcpy(out, d->pcm.data(), size_t(n) * 2);
    d->pcm.erase(d->pcm.begin(), d->pcm.begin() + n);
    return n;
}

void tc_fmtaudio_free(void* h) {
    FmtAudio* d = static_cast<FmtAudio*>(h);
    if (d->swr) swr_free(&d->swr);
    av_frame_free(&d->frame);
    av_packet_free(&d->pkt);
    avcodec_free_context(&d->ctx);
    avformat_close_input(&d->fmt);
    delete d;
}

// ------------------------------------------------------------------ //
// Raw packet extraction via libavformat (the extract_mxf.c /
// extract_ogm.c "stored payload out" role for ANY container this
// FFmpeg demuxes): open, pick a stream, read packets verbatim.

struct FmtPkt {
    AVFormatContext* fmt = nullptr;
    AVPacket* pkt = nullptr;
    int stream_index = -1;
    std::string err;
};

// stream_sel: >=0 explicit index, -1 best video, -2 best audio
void* tc_fmtpkt_open(const char* path, int stream_sel) {
    FmtPkt* d = new FmtPkt();
    if (avformat_open_input(&d->fmt, path, nullptr, nullptr) < 0) {
        delete d;
        return nullptr;
    }
    avformat_find_stream_info(d->fmt, nullptr);
    if (stream_sel >= 0) {
        if (stream_sel < int(d->fmt->nb_streams))
            d->stream_index = stream_sel;
    } else {
        AVMediaType t = (stream_sel == -2) ? AVMEDIA_TYPE_AUDIO
                                           : AVMEDIA_TYPE_VIDEO;
        d->stream_index = av_find_best_stream(d->fmt, t, -1, -1,
                                              nullptr, 0);
    }
    if (d->stream_index < 0) {
        avformat_close_input(&d->fmt);
        delete d;
        return nullptr;
    }
    d->pkt = av_packet_alloc();
    return d;
}

int tc_fmtpkt_codec(void* h, char* out, int maxlen) {
    FmtPkt* d = static_cast<FmtPkt*>(h);
    const char* name = avcodec_get_name(
        d->fmt->streams[d->stream_index]->codecpar->codec_id);
    snprintf(out, size_t(maxlen), "%s", name ? name : "");
    return int(strlen(out));
}

int tc_fmtpkt_extradata(void* h, uint8_t* out, int maxlen) {
    FmtPkt* d = static_cast<FmtPkt*>(h);
    AVCodecParameters* par = d->fmt->streams[d->stream_index]->codecpar;
    int n = par->extradata_size;
    if (n > maxlen) n = maxlen;
    if (n > 0) memcpy(out, par->extradata, size_t(n));
    return par->extradata_size;
}

// one packet's stored bytes; 0 at EOF, -1 if it exceeds maxbytes
int64_t tc_fmtpkt_next(void* h, uint8_t* out, int64_t maxbytes) {
    FmtPkt* d = static_cast<FmtPkt*>(h);
    while (av_read_frame(d->fmt, d->pkt) >= 0) {
        if (d->pkt->stream_index != d->stream_index) {
            av_packet_unref(d->pkt);
            continue;
        }
        int64_t n = d->pkt->size;
        if (n > maxbytes) { av_packet_unref(d->pkt); return -1; }
        memcpy(out, d->pkt->data, size_t(n));
        av_packet_unref(d->pkt);
        return n;
    }
    return 0;
}

void tc_fmtpkt_free(void* h) {
    FmtPkt* d = static_cast<FmtPkt*>(h);
    av_packet_free(&d->pkt);
    avformat_close_input(&d->fmt);
    delete d;
}

// ------------------------------------------------------------------ //
// Container muxing via libavformat (the multiplex_lavf.c role):
// coded packets from the bridge encoders into mp4/mkv/mpegts/...
// Streams declare a fixed pre-header time base (video 1/fps, audio
// 1/rate); packets carry pts in those units and are rescaled to
// whatever the muxer negotiated.

struct FmtMux {
    AVFormatContext* fmt = nullptr;
    std::vector<AVRational> in_tb;     // our per-stream input timebase
    bool header = false;
    std::string err;
};

void* tc_mux_open(const char* path, const char* format) {
    FmtMux* m = new FmtMux();
    avformat_alloc_output_context2(&m->fmt, nullptr,
                                   (format && *format) ? format
                                                       : nullptr,
                                   path);
    if (!m->fmt) { delete m; return nullptr; }
    if (!(m->fmt->oformat->flags & AVFMT_NOFILE)) {
        if (avio_open(&m->fmt->pb, path, AVIO_FLAG_WRITE) < 0) {
            avformat_free_context(m->fmt);
            delete m;
            return nullptr;
        }
    }
    return m;
}

static int mux_add_stream(FmtMux* m, const char* codec_name,
                          AVRational tb) {
    const AVCodecDescriptor* d =
        avcodec_descriptor_get_by_name(codec_name);
    if (!d) { m->err = "unknown codec"; return -1; }
    AVStream* st = avformat_new_stream(m->fmt, nullptr);
    if (!st) { m->err = "new stream"; return -1; }
    st->codecpar->codec_id = d->id;
    st->time_base = tb;
    m->in_tb.push_back(tb);
    return int(m->fmt->nb_streams) - 1;
}

int tc_mux_add_video(void* h, const char* codec_name, int w, int ht,
                     int fps_num, int fps_den,
                     const uint8_t* extradata, int xlen) {
    FmtMux* m = static_cast<FmtMux*>(h);
    int idx = mux_add_stream(m, codec_name,
                             AVRational{fps_den, fps_num});
    if (idx < 0) return idx;
    AVStream* st = m->fmt->streams[idx];
    st->codecpar->codec_type = AVMEDIA_TYPE_VIDEO;
    st->codecpar->width = w;
    st->codecpar->height = ht;
    st->avg_frame_rate = AVRational{fps_num, fps_den};
    // the DV muxer resolves its profile from (w, h, pix_fmt,
    // time_base); without a pixel format it cannot initialize
    if (!strcmp(codec_name, "dvvideo"))
        st->codecpar->format = (ht == 576 && w == 720)
            ? AV_PIX_FMT_YUV420P : AV_PIX_FMT_YUV411P;
    if (extradata && xlen > 0) {
        st->codecpar->extradata = static_cast<uint8_t*>(av_mallocz(
            size_t(xlen) + AV_INPUT_BUFFER_PADDING_SIZE));
        memcpy(st->codecpar->extradata, extradata, size_t(xlen));
        st->codecpar->extradata_size = xlen;
    }
    return idx;
}

int tc_mux_add_audio(void* h, const char* codec_name, int rate,
                     int channels, const uint8_t* extradata,
                     int xlen) {
    FmtMux* m = static_cast<FmtMux*>(h);
    int idx = mux_add_stream(m, codec_name, AVRational{1, rate});
    if (idx < 0) return idx;
    AVStream* st = m->fmt->streams[idx];
    st->codecpar->codec_type = AVMEDIA_TYPE_AUDIO;
    st->codecpar->sample_rate = rate;
    av_channel_layout_default(&st->codecpar->ch_layout, channels);
    if (extradata && xlen > 0) {
        st->codecpar->extradata = static_cast<uint8_t*>(av_mallocz(
            size_t(xlen) + AV_INPUT_BUFFER_PADDING_SIZE));
        memcpy(st->codecpar->extradata, extradata, size_t(xlen));
        st->codecpar->extradata_size = xlen;
    }
    return idx;
}

int tc_mux_write_header(void* h) {
    FmtMux* m = static_cast<FmtMux*>(h);
    int rc = avformat_write_header(m->fmt, nullptr);
    if (rc < 0) { m->err = "write_header failed"; return -1; }
    m->header = true;
    return 0;
}

int tc_mux_write(void* h, int stream, const uint8_t* data,
                 int64_t len, int64_t pts, int64_t duration,
                 int key) {
    FmtMux* m = static_cast<FmtMux*>(h);
    if (!m->header || stream < 0
            || stream >= int(m->fmt->nb_streams))
        return -1;
    AVPacket* pkt = av_packet_alloc();
    if (av_new_packet(pkt, int(len)) < 0) {
        av_packet_free(&pkt);
        return -1;
    }
    memcpy(pkt->data, data, size_t(len));
    pkt->stream_index = stream;
    pkt->pts = pkt->dts = pts;
    pkt->duration = duration;
    if (key) pkt->flags |= AV_PKT_FLAG_KEY;
    av_packet_rescale_ts(pkt, m->in_tb[stream],
                         m->fmt->streams[stream]->time_base);
    int rc = av_interleaved_write_frame(m->fmt, pkt);
    av_packet_free(&pkt);
    if (rc < 0) { m->err = "write failed"; return -1; }
    return 0;
}

const char* tc_mux_err(void* h) {
    return static_cast<FmtMux*>(h)->err.c_str();
}

int tc_mux_close(void* h) {
    FmtMux* m = static_cast<FmtMux*>(h);
    int rc = 0;
    if (m->header)
        rc = av_write_trailer(m->fmt);
    if (m->fmt && !(m->fmt->oformat->flags & AVFMT_NOFILE))
        avio_closep(&m->fmt->pb);
    avformat_free_context(m->fmt);
    delete m;
    return rc < 0 ? -1 : 0;
}

// ------------------------------------------------------------------ //
// File-level video decode via libavformat (import_ffmpeg.c role,
// native tier): any container/codec this FFmpeg demuxes+decodes,
// straight to YUV420P planes (no RGB round trip).

struct FmtVideo {
    AVFormatContext* fmt = nullptr;
    AVCodecContext* ctx = nullptr;
    SwsContext* sws = nullptr;
    AVPacket* pkt = nullptr;
    AVFrame* frame = nullptr;
    AVFrame* out = nullptr;
    int stream_index = -1;
    int w = 0, h = 0;
    double fps = 0.0;
    int64_t nframes = 0;
    bool eof = false;
    bool have = false;           // decoded frame waiting in out
    std::string err;
};

void* tc_fmtvideo_open(const char* path) {
    FmtVideo* d = new FmtVideo();
    if (avformat_open_input(&d->fmt, path, nullptr, nullptr) < 0) {
        delete d;
        return nullptr;
    }
    if (avformat_find_stream_info(d->fmt, nullptr) < 0) {
        avformat_close_input(&d->fmt);
        delete d;
        return nullptr;
    }
    d->stream_index = av_find_best_stream(d->fmt, AVMEDIA_TYPE_VIDEO,
                                          -1, -1, nullptr, 0);
    if (d->stream_index < 0) {
        avformat_close_input(&d->fmt);
        delete d;
        return nullptr;
    }
    AVStream* st = d->fmt->streams[d->stream_index];
    const AVCodec* c = avcodec_find_decoder(st->codecpar->codec_id);
    if (!c) {
        avformat_close_input(&d->fmt);
        delete d;
        return nullptr;
    }
    d->ctx = avcodec_alloc_context3(c);
    avcodec_parameters_to_context(d->ctx, st->codecpar);
    if (avcodec_open2(d->ctx, c, nullptr) < 0) {
        avcodec_free_context(&d->ctx);
        avformat_close_input(&d->fmt);
        delete d;
        return nullptr;
    }
    d->pkt = av_packet_alloc();
    d->frame = av_frame_alloc();
    d->out = av_frame_alloc();
    d->w = st->codecpar->width;
    d->h = st->codecpar->height;
    AVRational fr = st->avg_frame_rate;
    d->fps = fr.den ? double(fr.num) / fr.den : 0.0;
    d->nframes = st->nb_frames;
    return d;
}

int tc_fmtvideo_width(void* h) { return static_cast<FmtVideo*>(h)->w; }
int tc_fmtvideo_height(void* h) { return static_cast<FmtVideo*>(h)->h; }
double tc_fmtvideo_fps(void* h) {
    return static_cast<FmtVideo*>(h)->fps;
}
int64_t tc_fmtvideo_nframes(void* h) {
    return static_cast<FmtVideo*>(h)->nframes;
}

static int fmtvideo_pump(FmtVideo* d) {
    while (!d->have) {
        int rc = avcodec_receive_frame(d->ctx, d->frame);
        if (rc == 0) { d->have = true; break; }
        if (rc != AVERROR(EAGAIN) && rc != AVERROR_EOF) {
            d->err = "decode error";
            return -1;
        }
        if (d->eof) return 0;            // drained
        rc = av_read_frame(d->fmt, d->pkt);
        if (rc < 0) {
            d->eof = true;
            avcodec_send_packet(d->ctx, nullptr);
            continue;
        }
        if (d->pkt->stream_index == d->stream_index)
            avcodec_send_packet(d->ctx, d->pkt);
        av_packet_unref(d->pkt);
    }
    return d->have ? 1 : 0;
}

// 1 = frame written to y/u/v (YUV420P, caller-sized w*h), 0 = EOF,
// -1 = error
int tc_fmtvideo_read(void* hh, uint8_t* y, uint8_t* u, uint8_t* v) {
    FmtVideo* d = static_cast<FmtVideo*>(hh);
    int rc = fmtvideo_pump(d);
    if (rc <= 0) return rc;
    AVFrame* f = d->frame;
    if (!d->sws) {
        d->sws = sws_getContext(f->width, f->height,
                                (AVPixelFormat)f->format,
                                d->w, d->h, AV_PIX_FMT_YUV420P,
                                SWS_BILINEAR, nullptr, nullptr,
                                nullptr);
        if (!d->sws) { d->err = "sws"; return -1; }
    }
    uint8_t* dst[4] = {y, u, v, nullptr};
    int strides[4] = {d->w, d->w / 2, d->w / 2, 0};
    sws_scale(d->sws, f->data, f->linesize, 0, f->height, dst,
              strides);
    av_frame_unref(f);
    d->have = false;
    return 1;
}

void tc_fmtvideo_free(void* hh) {
    FmtVideo* d = static_cast<FmtVideo*>(hh);
    if (d->sws) sws_freeContext(d->sws);
    av_frame_free(&d->out);
    av_frame_free(&d->frame);
    av_packet_free(&d->pkt);
    avcodec_free_context(&d->ctx);
    avformat_close_input(&d->fmt);
    delete d;
}

// ------------------------------------------------------------------ //
// Container probe via libavformat (tcprobe fallback for formats the
// native magic table does not parse): writes a text summary.

int tc_fmtprobe(const char* path, char* out, int maxlen) {
    AVFormatContext* fmt = nullptr;
    if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0)
        return -1;
    if (avformat_find_stream_info(fmt, nullptr) < 0) {
        avformat_close_input(&fmt);
        return -1;
    }
    std::string s;
    char buf[256];
    snprintf(buf, sizeof buf, "container=%s\n",
             fmt->iformat ? fmt->iformat->name : "?");
    s += buf;
    if (fmt->duration > 0) {
        snprintf(buf, sizeof buf, "duration=%.3f\n",
                 double(fmt->duration) / AV_TIME_BASE);
        s += buf;
    }
    for (unsigned i = 0; i < fmt->nb_streams; i++) {
        AVCodecParameters* p = fmt->streams[i]->codecpar;
        const char* name = avcodec_get_name(p->codec_id);
        if (p->codec_type == AVMEDIA_TYPE_VIDEO) {
            AVRational fr = fmt->streams[i]->avg_frame_rate;
            snprintf(buf, sizeof buf, "video=%s %dx%d %.3f\n", name,
                     p->width, p->height,
                     fr.den ? double(fr.num) / fr.den : 0.0);
            s += buf;
        } else if (p->codec_type == AVMEDIA_TYPE_AUDIO) {
            snprintf(buf, sizeof buf, "audio=%s %d %d\n", name,
                     p->sample_rate, p->ch_layout.nb_channels);
            s += buf;
        }
    }
    avformat_close_input(&fmt);
    int n = int(s.size());
    if (n >= maxlen) n = maxlen - 1;
    memcpy(out, s.data(), size_t(n));
    out[n] = 0;
    return n;
}

// ------------------------------------------------------------------ //
// LZO1X decompression (libavutil): the import_lzo.c role

int tc_lzo1x_decode(const uint8_t* in, int inlen, uint8_t* out,
                    int* outlen) {
    int remaining_out = *outlen;
    int remaining_in = inlen;
    int rc = av_lzo1x_decode(out, &remaining_out, in, &remaining_in);
    if (rc != 0) return -1;
    *outlen -= remaining_out;
    return 0;
}

}  // extern "C"
