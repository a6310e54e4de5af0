// Minimal clean-room GDAL stand-in so the reference headers COMPILE.
// The parity harness never exercises the GDAL-backed TIFF paths (it
// compares the RRC / registration / remap / phaseCorrelate compute
// paths); any runtime call into this stub aborts loudly.
#ifndef OIP_PARITY_GDAL_STUB
#define OIP_PARITY_GDAL_STUB

#include <cstdio>
#include <cstdlib>

typedef enum { GF_Read = 0, GF_Write = 1 } GDALRWFlag;
typedef enum { CE_None = 0, CE_Failure = 3 } CPLErr;
typedef enum { GDT_Unknown = 0, GDT_UInt16 = 2 } GDALDataType;
typedef enum {
    GCI_Undefined = 0,
    GCI_RedBand = 3,
    GCI_GreenBand = 4,
    GCI_BlueBand = 5,
    GCI_AlphaBand = 6,
} GDALColorInterp;

[[noreturn]] inline void oip_gdal_stub_trap(const char * what) {
    fprintf(stderr, "parity harness: GDAL stub '%s' called at runtime\n",
            what);
    abort();
}

class GDALRasterBand {
public:
    CPLErr RasterIO(GDALRWFlag, int, int, int, int, void *, int, int,
                    GDALDataType, int, int) {
        oip_gdal_stub_trap("GDALRasterBand::RasterIO");
    }
    void SetColorInterpretation(GDALColorInterp) {
        oip_gdal_stub_trap("GDALRasterBand::SetColorInterpretation");
    }
};

class GDALDataset {
public:
    GDALRasterBand * GetRasterBand(int) {
        oip_gdal_stub_trap("GDALDataset::GetRasterBand");
    }
};

class GDALDriver {
public:
    GDALDataset * Create(const char *, int, int, int, GDALDataType,
                         char **) {
        oip_gdal_stub_trap("GDALDriver::Create");
    }
};

class GDALDriverManager {
public:
    GDALDriver * GetDriverByName(const char *) {
        oip_gdal_stub_trap("GDALDriverManager::GetDriverByName");
    }
};

inline GDALDriverManager * GetGDALDriverManager() {
    static GDALDriverManager m;
    return &m;
}

inline void GDALClose(GDALDataset *) {}
inline void GDALAllRegister() {}

inline char ** CSLParseCommandLine(const char *) { return nullptr; }
inline char ** CSLSetNameValue(char ** list, const char *, const char *) {
    return list;
}
inline void CSLDestroy(char **) {}

#endif  // OIP_PARITY_GDAL_STUB
