// Compiled-C++ parity harness: builds the REFERENCE implementation's own
// headers (/root/reference/OpticalImageProcessor) against the real OpenCV
// on this host and drives its exact compute paths, so the repo's parity
// gates compare against actually-compiled reference code rather than a
// numpy oracle:
//   rrc    — IMO::LoadRRCParamFile + IMO::InplaceRRC (imageop.h:129-196)
//   align  — PreProcessor::{LoadPAN,DoRRC4PAN,LoadMSS,DoRRC4MSS,
//            CalcInterBandCorrelation,DoInterBandAlignment}
//            (preproc.h:51-468) incl. cv::resize / cv::phaseCorrelate /
//            cv::remap and the polynomial fit; dumps the fitted
//            coefficients and writes the ALIGNED TIFF via cv::imwrite
//   stt    — Stitcher::{CalcSttParameters,PreStitch} (stitcher.h:83-201)
//            incl. cv::phaseCorrelate on the overlap strips and the
//            SectionaryRemap cv::remap pass; dumps dx/dy/response and
//            writes the .PRESTT.RAW
//   auxsep — AuxSeparator::Separate (aux_separator.h:224-245): the full
//            two-thread AOS scan + IMTR reassembly + image-data
//            separation incl. CRC validation, JPEG2000 inflate and the
//            zero-fill / incomplete-frame rules; writes .IMDT/.AUX/
//            .PAN.RAW/.MSS.RAW into the given output dir (chdir'ed, as
//            the reference emits into the CWD)
// GDAL / NumCpp / libimsux are satisfied by minimal clean-room stubs in
// ./stubs (see each header); the GDAL-backed output paths are never
// executed.  `private` is remapped so the harness can dump internal fit
// state — standard test-harness practice, no reference code is modified.

#include <cstdio>
#include <cstring>
#include <string>
#include <thread>  // aux_separator.h uses this_thread::sleep_for but only
                   // includes <future>/<mutex>; libstdc++ needs <thread>

#include <opencv2/core.hpp>
#include <opencv2/imgproc.hpp>
#include <opencv2/imgcodecs.hpp>

// CLI11 subset the reference headers reference (main.cpp owns the real
// CLI11 dependency; the compute headers only use detail::to_lower)
#include <algorithm>
namespace CLI {
namespace detail {
inline std::string to_lower(std::string s) {
    std::transform(s.begin(), s.end(), s.begin(),
                   [](unsigned char c) { return std::tolower(c); });
    return s;
}
}  // namespace detail
}  // namespace CLI

#define private public
#define protected public
#include "preproc.h"
#include "stitcher.h"
#include "aux_separator.h"
#undef protected
#undef private

#include <unistd.h>

USING_NS(OIP)

static int cmd_rrc(int argc, char ** argv) {
    // rrc <raw> <rrc_csv> <pixels_per_line> <out_raw>
    if (argc != 4) {
        fprintf(stderr, "usage: harness rrc RAW RRC_CSV PPL OUT\n");
        return 2;
    }
    const std::string raw = argv[0], rrc = argv[1], out = argv[3];
    const int ppl = atoi(argv[2]);
    IMO::DoRRC4RAW(raw, ppl, rrc, out);
    printf("rrc done: %s\n", out.c_str());
    return 0;
}

static int cmd_align(int argc, char ** argv) {
    // align <pan> <mss> <rrc_pan> <rrc_b1..b4> <slices> <sections>
    //       <line_per_section> <line_offset> <overlap> <keep_leading>
    //       <coeff_dump>
    if (argc != 13) {
        fprintf(stderr,
                "usage: harness align PAN MSS RRCPAN B1 B2 B3 B4 SLICES "
                "SECTIONS LPS OFFSET OVERLAP COEFF_OUT (keepLeading=0)\n");
        return 2;
    }
    std::string rrcBands[MSS_BANDS] = {argv[3], argv[4], argv[5], argv[6]};
    PreProcessor pp(argv[0], argv[1], argv[2], rrcBands);
    const int slices = atoi(argv[7]);
    const int sections = atoi(argv[8]);
    const int lps = atoi(argv[9]);
    const int offset = atoi(argv[10]);
    const int overlap = atoi(argv[11]);

    pp.LoadPAN();
    pp.DoRRC4PAN();
    pp.LoadMSS();
    pp.DoRRC4MSS();
    pp.CalcInterBandCorrelation(slices, sections, IBCV_DEF_THRESHOLD,
                                /*autoUnloadPAN=*/true);

    FILE * fc = fopen(argv[12], "w");
    if (!fc) {
        perror("coeff dump");
        return 2;
    }
    for (int b = 0; b < MSS_BANDS; ++b) {
        fprintf(fc, "band %d cx %.17g %.17g cy %.17g %.17g %.17g\n", b,
                pp.mDeltaXcoeffs[b][0], pp.mDeltaXcoeffs[b][1],
                pp.mDeltaYcoeffs[b][0], pp.mDeltaYcoeffs[b][1],
                pp.mDeltaYcoeffs[b][2]);
        // raw per-slice samples for sample-level parity checks
        for (int i = 0; i < slices * sections; ++i) {
            const InterBandShift & s = pp.mBandShift[b][i];
            fprintf(fc, "sample %d %d cx %d dx %.17g dy %.17g rs %.17g\n",
                    b, i, s.cx, s.dx, s.dy, s.rs);
        }
    }
    fclose(fc);

    // writes <cwd>/<mss stem>.ALIGNED.TIFF via cv::imwrite
    pp.DoInterBandAlignment(lps, offset, overlap, /*keepLeadingLines=*/false);
    printf("align done\n");
    return 0;
}

static int cmd_stt(int argc, char ** argv) {
    // stt <pan1> <pan2> <sections> <line_per_section> <overlap_cols>
    //     <delta_dump>
    if (argc != 6) {
        fprintf(stderr,
                "usage: harness stt PAN1 PAN2 SECTIONS LPS OVERLAP OUT\n");
        return 2;
    }
    Stitcher st(argv[0], argv[1], "", "", atoi(argv[2]), atoi(argv[3]),
                atoi(argv[4]));
    // mirrors the CLI's --no-rrc route: mRrcFilePAN1/2 stay the input
    // paths (stitcher.h:79-80)
    st.CalcSttParameters();
    FILE * fd = fopen(argv[5], "w");
    if (!fd) {
        perror("delta dump");
        return 2;
    }
    fprintf(fd, "dx %.17g dy %.17g rs %.17g\n", st.mDeltaX, st.mDeltaY,
            st.mResponse);
    fclose(fd);
    st.PreStitch();  // writes <cwd>/<pan2 stem>.PRESTT.RAW
    printf("stt done\n");
    return 0;
}

static int cmd_auxsep(int argc, char ** argv) {
    // auxsep <aos_or_imdt> <byte_offset> <outdir>
    // The reference's Separate() writes the IMDT into the CWD and derives
    // AUX/PAN/MSS from it via BuildOutputFilePath (also CWD-based,
    // aux_separator.h:260-262, 513-524), so the harness chdir's first.
    if (argc != 3) {
        fprintf(stderr, "usage: harness auxsep FILE OFFSET OUTDIR\n");
        return 2;
    }
    const std::string file = argv[0];
    const size_t offset = strtoull(argv[1], nullptr, 10);
    if (chdir(argv[2]) != 0) {
        perror("chdir outdir");
        return 2;
    }
    AuxSeparator as(file, offset);
    as.Separate();
    printf("auxsep done: %s\n", as.mIMDTFileName.c_str());
    return 0;
}

int main(int argc, char ** argv) {
    if (argc < 2) {
        fprintf(stderr, "usage: harness {rrc|align|stt|auxsep} ...\n");
        return 2;
    }
    try {
        if (!strcmp(argv[1], "rrc")) return cmd_rrc(argc - 2, argv + 2);
        if (!strcmp(argv[1], "align")) return cmd_align(argc - 2, argv + 2);
        if (!strcmp(argv[1], "stt")) return cmd_stt(argc - 2, argv + 2);
        if (!strcmp(argv[1], "auxsep")) return cmd_auxsep(argc - 2, argv + 2);
    } catch (const std::exception & e) {
        fprintf(stderr, "harness error: %s\n", e.what());
        return 1;
    }
    fprintf(stderr, "unknown subcommand: %s\n", argv[1]);
    return 2;
}
