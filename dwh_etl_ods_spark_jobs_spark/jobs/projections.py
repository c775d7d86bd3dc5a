"""Per-job final projection lists (target column order).

Every reference job ends in an explicit SELECT column list immediately
before its JDBC append (the `columnList` constant in each job main —
cited per entry). These are the DDL-ordered projections `JobSpec.select`
applies after PII hashing; the in-flight hash columns are appended by
the catalog for jobs whose reference list predates hashing (the
reference hashed post-write via DatabaseUtils instead).

ct_patients and ct_patient_visits keep curated lists in catalog.py
(the visits list comes from PatientVisitsDDL.sql rather than the Java).
"""

from __future__ import annotations

PROJECTIONS: dict[str, tuple[str, ...]] = {
    # LoadAdverseEvents.java:151
    'ct_adverse_events': (
        'PatientID', 'Patientpk', 'SiteCode', 'AdverseEvent',
        'AdverseEventStartDate', 'AdverseEventEndDate', 'Severity',
        'VisitDate', 'EMR', 'Project', 'AdverseEventCause',
        'AdverseEventRegimen', 'AdverseEventActionTaken',
        'AdverseEventClinicalOutcome', 'AdverseEventIsPregnant',
        'Date_Created', 'Date_Last_Modified', 'recorduuid', 'voided',
        'LoadDate',
    ),
    # LoadCTAllergies.java:143
    'ct_allergies': (
        'ID', 'PatientID', 'PatientPK', 'SiteCode', 'FacilityName', 'VisitID',
        'VisitDate', 'Emr', 'Project', 'ChronicIllness', 'ChronicOnsetDate',
        'knownAllergies', 'AllergyCausativeAgent', 'AllergicReaction',
        'AllergySeverity', 'AllergyOnsetDate', 'Skin', 'Eyes', 'ENT', 'Chest',
        'CVS', 'Abdomen', 'CNS', 'Genitourinary', 'Date_Created',
        'Date_Last_Modified', 'recorduuid', 'voided',
    ),
    # LoadARTPatients.java:187
    'ct_art_patients': (
        'ID', 'PatientID', 'PatientPK', 'SiteCode', 'FacilityName',
        'AgeEnrollment', 'AgeARTStart', 'AgeLastVisit', 'RegistrationDate',
        'PatientSource', 'Gender', 'StartARTDate', 'PreviousARTStartDate',
        'PreviousARTRegimen', 'StartARTAtThisFacility', 'StartRegimen',
        'StartRegimenLine', 'LastARTDate', 'LastRegimen', 'LastRegimenLine',
        'Duration', 'ExpectedReturn', 'Provider', 'LastVisit', 'ExitReason',
        'ExitDate', 'Emr', 'Project', 'DOB', 'PreviousARTUse',
        'PreviousARTPurpose', 'DateLastUsed', 'DateAsOf', 'Date_Created',
        'Date_Last_Modified', 'recorduuid', 'voided',
    ),
    # LoadCancerScreening.java:84
    'ct_cancer_screening': (
        'Sitecode', 'PatientPK', 'PatientID', 'Emr', 'Project', 'Voided',
        'Id', 'FacilityName', 'VisitType', 'VisitID', 'VisitDate',
        'SmokesCigarette', 'NumberYearsSmoked', 'NumberCigarettesPerDay',
        'OtherFormTobacco', 'TakesAlcohol', 'HIVStatus', 'FamilyHistoryOfCa',
        'PreviousCaTreatment', 'SymptomsCa', 'CancerType',
        'FecalOccultBloodTest', 'TreatmentOccultBlood', 'Colonoscopy',
        'TreatmentColonoscopy', 'EUA', 'TreatmentRetinoblastoma',
        'RetinoblastomaGene', 'TreatmentEUA', 'DRE', 'TreatmentDRE', 'PSA',
        'TreatmentPSA', 'VisualExamination', 'TreatmentVE', 'Cytology',
        'TreatmentCytology', 'Imaging', 'TreatmentImaging', 'Biopsy',
        'TreatmentBiopsy', 'PostTreatmentComplicationCause',
        'OtherPostTreatmentComplication', 'ReferralReason', 'ScreeningMethod',
        'TreatmentToday', 'ReferredOut', 'NextAppointmentDate',
        'ScreeningType', 'HPVScreeningResult', 'TreatmentHPV',
        'VIAScreeningResult', 'VIAVILIScreeningResult', 'VIATreatmentOptions',
        'PAPSmearScreeningResult', 'TreatmentPapSmear', 'ReferalOrdered',
        'Colposcopy', 'TreatmentColposcopy', 'BiopsyCINIIandAbove',
        'BiopsyCINIIandBelow', 'BiopsyNotAvailable', 'CBE', 'TreatmentCBE',
        'Ultrasound', 'TreatmentUltraSound', 'IfTissueDiagnosis',
        'DateTissueDiagnosis', 'ReasonNotDone', 'FollowUpDate', 'Referred',
        'ReasonForReferral', 'RecordUUID', 'Date_Created',
        'Date_Last_Modified', 'Created', 'LoadDate',
    ),
    # LoadCervicalScreening.java:83
    'ct_cervical_screening': (
        'SiteCode', 'PatientPK', 'PatientID', 'Emr', 'Project', 'Voided',
        'Processed', 'Id', 'FacilityName', 'VisitID', 'VisitDate',
        'VisitType', 'ScreeningMethod', 'TreatmentToday', 'ReferredOut',
        'NextAppointmentDate', 'ScreeningType', 'ScreeningResult',
        'PostTreatmentComplicationCause', 'OtherPostTreatmentComplication',
        'ReferralReason', 'Created', 'Date_Created', 'Date_Last_Modified',
    ),
    # LoadCTContactListing.java:115
    'ct_contact_listing': (
        'ID', 'PatientID', 'PatientPK', 'SiteCode', 'FacilityName', 'Emr',
        'Project', 'PartnerPersonID', 'ContactAge', 'ContactSex',
        'ContactMaritalStatus', 'RelationshipWithPatient', 'ScreenedForIpv',
        'IpvScreening', 'IPVScreeningOutcome',
        'CurrentlyLivingWithIndexClient', 'KnowledgeOfHivStatus',
        'PnsApproach', 'ContactPatientPK', 'DateCreated', 'Date_Created',
        'Date_Last_Modified', 'recorduuid', 'voided',
    ),
    # LoadCTCovid.java:108
    'ct_covid': (
        'ID', 'PatientPK', 'PatientID', 'Emr', 'Project', 'SiteCode',
        'FacilityName', 'VisitID', 'Covid19AssessmentDate',
        'ReceivedCOVID19Vaccine', 'DateGivenFirstDose',
        'FirstDoseVaccineAdministered', 'DateGivenSecondDose',
        'SecondDoseVaccineAdministered', 'VaccinationStatus',
        'VaccineVerification', 'BoosterGiven', 'BoosterDose',
        'BoosterDoseDate', 'EverCOVID19Positive', 'COVID19TestDate',
        'PatientStatus', 'AdmissionStatus', 'AdmissionUnit',
        'MissedAppointmentDueToCOVID19', 'COVID19PositiveSinceLasVisit',
        'COVID19TestDateSinceLastVisit', 'PatientStatusSinceLastVisit',
        'AdmissionStatusSinceLastVisit', 'AdmissionStartDate',
        'AdmissionEndDate', 'AdmissionUnitSinceLastVisit',
        'SupplementalOxygenReceived', 'PatientVentilated',
        'TracingFinalOutcome', 'CauseOfDeath', 'BoosterDoseVerified',
        'Sequence', 'COVID19TestResult', 'Date_Created', 'Date_Last_Modified',
        'recorduuid', 'voided',
    ),
    # LoadCTDefaulterTracing.java:92
    'ct_defaulter_tracing': (
        'ID', 'PatientPK', 'PatientID', 'Emr', 'Project', 'SiteCode',
        'FacilityName', 'VisitID', 'VisitDate', 'EncounterId', 'TracingType',
        'TracingOutcome', 'AttemptNumber', 'IsFinalTrace', 'TrueStatus',
        'CauseOfDeath', 'Comments', 'BookingDate', 'Date_Created',
        'Date_Last_Modified', 'recorduuid', 'voided',
    ),
    # LoadDepressionScreening.java:91
    'ct_depression_screening': (
        'ID', 'PatientID', 'PatientPK', 'SiteCode', 'FacilityName', 'VisitID',
        'VisitDate', 'Emr', 'Project', 'PHQ9_1', 'PHQ9_2', 'PHQ9_3', 'PHQ9_4',
        'PHQ9_5', 'PHQ9_6', 'PHQ9_7', 'PHQ9_8', 'PHQ9_9', 'PHQ_9_rating',
        'DepressionAssesmentScore', 'Date_Created', 'Date_Last_Modified',
        'recorduuid', 'voided',
    ),
    # LoadDrugAlcoholScreening.java:97
    'ct_drug_alcohol_screening': (
        'ID', 'PatientID', 'PatientPK', 'SiteCode', 'FacilityName', 'VisitID',
        'VisitDate', 'Emr', 'Project', 'DrinkingAlcohol', 'Smoking',
        'DrugUse', 'Date_Created', 'Date_Last_Modified',
    ),
    # LoadEnhancedAdherenceCounselling.java:100
    'ct_enhanced_adherence_counselling': (
        'ID', 'PatientID', 'PatientPK', 'SiteCode', 'FacilityName', 'VisitID',
        'VisitDate', 'Emr', 'Project', 'SessionNumber', 'DateOfFirstSession',
        'PillCountAdherence', 'MMAS4_1', 'MMAS4_2', 'MMAS4_3', 'MMAS4_4',
        'MMSA8_1', 'MMSA8_2', 'MMSA8_3', 'MMSA8_4', 'MMSAScore',
        'EACRecievedVL', 'EACVL', 'EACVLConcerns', 'EACVLThoughts',
        'EACWayForward', 'EACCognitiveBarrier', 'EACBehaviouralBarrier_1',
        'EACBehaviouralBarrier_2', 'EACBehaviouralBarrier_3',
        'EACBehaviouralBarrier_4', 'EACBehaviouralBarrier_5',
        'EACEmotionalBarriers_1', 'EACEmotionalBarriers_2',
        'EACEconBarrier_1', 'EACEconBarrier_2', 'EACEconBarrier_3',
        'EACEconBarrier_4', 'EACEconBarrier_5', 'EACEconBarrier_6',
        'EACEconBarrier_7', 'EACEconBarrier_8', 'EACReviewImprovement',
        'EACReviewMissedDoses', 'EACReviewStrategy', 'EACReferral',
        'EACReferralApp', 'EACReferralExperience', 'EACHomevisit',
        'EACAdherencePlan', 'EACFollowupDate', 'Date_Created',
        'Date_Last_Modified', 'recorduuid', 'voided',
    ),
    # LoadFacilityManifest.java:75
    'ct_facility_manifest': (
        'ID', 'Voided', 'Processed', 'SiteCode', 'PatientCount',
        'DateRecieved', 'Name', 'EmrName', 'EmrSetup', 'UploadMode', 'Start',
        'End', 'Tag',
    ),
    # LoadCTGBVScreening.java:86
    'ct_gbv_screening': (
        'ID', 'PatientID', 'PatientPK', 'SiteCode', 'FacilityName', 'VisitID',
        'VisitDate', 'Emr', 'Project', 'IPV', 'PhysicalIPV', 'EmotionalIPV',
        'SexualIPV', 'IPVRelationship', 'Date_Created', 'Date_Last_Modified',
        'recorduuid', 'voided',
    ),
    # LoadIITRiskScores.java:84
    'ct_iit_risk_scores': (
        'SiteCode', 'PatientID', 'PatientPK', 'Emr', 'Project', 'Voided',
        'Processed', 'Id', 'FacilityName', 'SourceSysUUID', 'RiskScore',
        'RiskFactors', 'RiskDescription', 'RiskEvaluationDate', 'Created',
        'Date_Created', 'Date_Last_Modified', 'LoadDate',
    ),
    # LoadCTIPT.java:102
    'ct_ipt': (
        'ID', 'PatientID', 'PatientPK', 'SiteCode', 'FacilityName', 'VisitID',
        'VisitDate', 'Emr', 'Project', 'OnTBDrugs', 'OnIPT', 'EverOnIPT',
        'Cough', 'Fever', 'NoticeableWeightLoss', 'NightSweats', 'Lethargy',
        'ICFActionTaken', 'TestResult', 'TBClinicalDiagnosis',
        'ContactsInvited', 'EvaluatedForIPT', 'StartAntiTBs', 'TBRxStartDate',
        'TBScreening', 'IPTClientWorkUp', 'StartIPT', 'IndicationForIPT',
        'Date_Created', 'Date_Last_Modified', 'recorduuid', 'voided',
    ),
    # LoadCTOTZ.java:103
    'ct_otz': (
        'ID', 'PatientID', 'PatientPK', 'SiteCode', 'FacilityName', 'VisitID',
        'VisitDate', 'Emr', 'Project', 'OTZEnrollmentDate',
        'TransferInStatus', 'ModulesPreviouslyCovered',
        'ModulesCompletedToday', 'SupportGroupInvolvement', 'Remarks',
        'TransitionAttritionReason', 'OutcomeDate', 'Date_Created',
        'Date_Last_Modified', 'recorduuid', 'voided',
    ),
    # LoadCTOVC.java:90
    'ct_ovc': (
        'ID', 'PatientID', 'PatientPK', 'SiteCode', 'FacilityName', 'VisitID',
        'VisitDate', 'Emr', 'Project', 'OVCEnrollmentDate',
        'RelationshipToClient', 'EnrolledinCPIMS', 'CPIMSUniqueIdentifier',
        'PartnerOfferingOVCServices', 'OVCExitReason', 'ExitDate',
        'Date_Created', 'Date_Last_Modified', 'recorduuid', 'voided',
    ),
    # LoadPatientBaselines.java:104
    'ct_patient_baselines': (
        'ID', 'PatientID', 'PatientPK', 'SiteCode', 'bCD4', 'bCD4Date',
        'bWHO', 'bWHODate', 'eCD4', 'eCD4Date', 'eWHO', 'eWHODate', 'lastWHO',
        'lastWHODate', 'lastCD4', 'lastCD4Date', 'm12CD4', 'm12CD4Date',
        'm6CD4', 'm6CD4Date', 'Emr', 'Project', 'bWAB', 'bWABDate', 'eWAB',
        'eWABDate', 'lastWAB', 'lastWABDate', 'Date_Created',
        'Date_Last_Modified', 'recorduuid', 'voided',
    ),
    # LoadPatientLabs.java:122
    'ct_patient_labs': (
        'ID', 'PatientID', 'PatientPk', 'SiteCode', 'FacilityName', 'VisitID',
        'OrderedbyDate', 'ReportedbyDate', 'TestName', 'EnrollmentTest',
        'TestResult', 'Emr', 'Project', 'DateSampleTaken', 'SampleType',
        'reason', 'Date_Created', 'Date_Last_Modified', 'recorduuid',
        'voided',
    ),
    # LoadPatientPharmacy.java:153
    'ct_patient_pharmacy': (
        'ID', 'PatientID', 'SiteCode', 'FacilityName', 'PatientPK', 'VisitID',
        'Drug', 'DispenseDate', 'Duration', 'ExpectedReturn', 'TreatmentType',
        'PeriodTaken', 'ProphylaxisType', 'Emr', 'Project', 'RegimenLine',
        'RegimenChangedSwitched', 'RegimenChangeSwitchReason',
        'StopRegimenReason', 'StopRegimenDate', 'Date_Created',
        'Date_Last_Modified', 'recorduuid', 'voided',
    ),
    # LoadPatientVisits.java:139
    'ct_patient_visits': (
        'PatientID', 'FacilityName', 'SiteCode', 'PatientPK', 'VisitID',
        'VisitDate', 'SERVICE', 'VisitType', 'WHOStage', 'WABStage',
        'Pregnant', 'LMP', 'EDD', 'Height', 'Weight', 'BP', 'OI', 'OIDate',
        'Adherence', 'AdherenceCategory', 'FamilyPlanningMethod', 'PwP',
        'GestationAge', 'NextAppointmentDate', 'Emr', 'Project',
        'DifferentiatedCare', 'StabilityAssessment', 'KeyPopulationType',
        'PopulationType', 'VisitBy', 'Temp', 'PulseRate', 'RespiratoryRate',
        'OxygenSaturation', 'Muac', 'NutritionalStatus', 'EverHadMenses',
        'Breastfeeding', 'Menopausal', 'NoFPReason', 'ProphylaxisUsed',
        'CTXAdherence', 'CurrentRegimen', 'HCWConcern', 'TCAReason',
        'ClinicalNotes', 'ZScore', 'ZScoreAbsolute', 'RefillDate',
        'PaedsDisclosure', 'Date_Created', 'Date_Last_Modified', 'recorduuid',
        'voided',
    ),
    # LoadCTPatients.java:194
    'ct_patients': (
        'ID', 'PatientID', 'PatientPK', 'SiteCode', 'FacilityName', 'Gender',
        'DOB', 'RegistrationDate', 'RegistrationAtCCC', 'RegistrationAtPMTCT',
        'RegistrationAtTBClinic', 'PatientSource', 'Region', 'District',
        'Village', 'ContactRelation', 'LastVisit', 'MaritalStatus',
        'EducationLevel', 'DateConfirmedHIVPositive', 'PreviousARTExposure',
        'PreviousARTStartDate', 'Emr', 'Project', 'Orphan', 'Inschool',
        'PatientType', 'PopulationType', 'KeyPopulationType',
        'PatientResidentCounty', 'PatientResidentSubCounty',
        'PatientResidentLocation', 'PatientResidentSubLocation',
        'PatientResidentWard', 'PatientResidentVillage', 'TransferInDate',
        'Occupation', 'NUPI', 'Pkv', 'Date_Created', 'Date_Last_Modified',
        'recorduuid', 'voided',
    ),
    # LoadHtsClientLinkages.java:95
    'hts_client_linkages': (
        'FacilityName', 'SiteCode', 'PatientPk', 'HtsNumber', 'Emr',
        'Project', 'EnrolledFacilityName', 'ReferralDate', 'DateEnrolled',
        'DatePrefferedToBeEnrolled', 'FacilityReferredTo', 'HandedOverTo',
        'HandedOverToCadre', 'ReportedCCCNumber', 'RecordUUID',
    ),
    # LoadHtsClientTests.java:152
    'hts_client_tests': (
        'FacilityName', 'SiteCode', 'PatientPk', 'Emr', 'Project',
        'EncounterId', 'TestDate', 'EverTestedForHiv', 'MonthsSinceLastTest',
        'ClientTestedAs', 'EntryPoint', 'TestStrategy', 'TestResult1',
        'TestResult2', 'FinalTestResult', 'PatientGivenResult', 'TbScreening',
        'ClientSelfTested', 'CoupleDiscordant', 'TestType', 'Consent',
        'Setting', 'Approach', 'HtsRiskCategory', 'HtsRiskScore',
        'OtherReferredServices', 'ReferredForServices', 'ReferredServices',
        'RecordUUID',
    ),
    # LoadHtsClientTracing.java:86
    'hts_client_tracing': (
        'FacilityName', 'SiteCode', 'PatientPk', 'HtsNumber', 'Emr',
        'Project', 'TracingType', 'TracingDate', 'TracingOutcome',
        'RecordUUID',
    ),
    # LoadHtsClients.java:131
    'hts_clients': (
        'HtsNumber', 'Emr', 'Project', 'PatientPk', 'SiteCode',
        'FacilityName', 'Dob', 'Gender', 'MaritalStatus', 'KeyPopulationType',
        'DisabilityType', 'PatientDisabled', 'County', 'SubCounty', 'Ward',
        'NUPI', 'HtsRecencyId', 'Occupation', 'PriorityPopulationType', 'pkv',
        'RecordUUID',
    ),
    # LoadHtsEligibility.java:128
    'hts_eligibility': (
        'ID', 'FacilityName', 'SiteCode', 'PatientPk', 'HtsNumber', 'Emr',
        'Project', 'Processed', 'QueueId', 'Status', 'StatusDate',
        'EncounterId', 'VisitID', 'VisitDate', 'PopulationType',
        'KeyPopulation', 'PriorityPopulation', 'Department', 'PatientType',
        'IsHealthWorker', 'RelationshipWithContact', 'TestedHIVBefore',
        'WhoPerformedTest', 'ResultOfHIV', 'DateTestedSelf', 'StartedOnART',
        'CCCNumber', 'EverHadSex', 'SexuallyActive', 'NewPartner',
        'PartnerHIVStatus', 'CoupleDiscordant', 'MultiplePartners',
        'NumberOfPartners', 'AlcoholSex', 'MoneySex', 'CondomBurst',
        'UnknownStatusPartner', 'KnownStatusPartner', 'Pregnant',
        'BreastfeedingMother', 'ExperiencedGBV', 'ContactWithTBCase',
        'Lethargy', 'EverOnPrep', 'CurrentlyOnPrep', 'EverOnPep',
        'CurrentlyOnPep', 'EverHadSTI', 'CurrentlyHasSTI', 'EverHadTB',
        'SharedNeedle', 'NeedleStickInjuries', 'TraditionalProcedures',
        'ChildReasonsForIneligibility', 'EligibleForTest',
        'ReasonsForIneligibility', 'SpecificReasonForIneligibility', 'Cough',
        'DateTestedProvider', 'Fever', 'MothersStatus', 'NightSweats',
        'ReferredForTesting', 'ResultOfHIVSelf', 'ScreenedTB', 'TBStatus',
        'WeightLoss', 'AssessmentOutcome', 'ForcedSex', 'ReceivedServices',
        'TypeGBV', 'Disability', 'DisabilityType', 'HTSStrategy',
        'HTSEntryPoint', 'HIVRiskCategory', 'ReasonRefferredForTesting',
        'ReasonNotReffered', 'HtsRiskScore', 'RecordUUID',
    ),
    # LoadPartnerNotificationServices.java:103
    'hts_partner_notification_services': (
        'ID', 'FacilityName', 'SiteCode', 'PatientPk', 'HtsNumber', 'Emr',
        'Project', 'PartnerPatientPk', 'KnowledgeOfHivStatus',
        'PartnerPersonID', 'CccNumber', 'IpvScreeningOutcome',
        'ScreenedForIpv', 'PnsConsent', 'RelationsipToIndexClient',
        'LinkedToCare', 'MaritalStatus', 'PnsApproach', 'FacilityLinkedTo',
        'Gender', 'CurrentlyLivingWithIndexClient', 'Age', 'DateElicited',
        'Dob', 'LinkDateLinkedToCare', 'RecordUUID',
    ),
    # LoadHtsPartnerTracing.java:88
    'hts_partner_tracing': (
        'FacilityName', 'SiteCode', 'PatientPk', 'HtsNumber', 'Emr',
        'Project', 'TraceType', 'TraceDate', 'TraceOutcome', 'BookingDate',
        'RecordUUID',
    ),
    # LoadHtsTestKits.java:99
    'hts_test_kits': (
        'FacilityName', 'SiteCode', 'PatientPk', 'HtsNumber', 'Emr',
        'Project', 'EncounterId', 'TestKitName1', 'TestKitLotNumber1',
        'TestKitExpiry1', 'TestResult1', 'TestKitName2', 'TestKitLotNumber2',
        'TestKitExpiry2', 'TestResult2', 'RecordUUID',
    ),
    # LoadMnchAncVisits.java:86
    'mnch_anc_visits': (
        'PatientMnchID', 'ANCClinicNumber', 'PatientPk', 'SiteCode',
        'FacilityName', 'EMR', 'Project', 'VisitID', 'VisitDate',
        'ANCVisitNo', 'GestationWeeks', 'Height', 'Weight', 'Temp',
        'PulseRate', 'RespiratoryRate', 'OxygenSaturation', 'MUAC', 'BP',
        'BreastExam', 'AntenatalExercises', 'FGM', 'FGMComplications',
        'Haemoglobin', 'DiabetesTest', 'TBScreening', 'CACxScreen',
        'CACxScreenMethod', 'WHOStaging', 'VLSampleTaken', 'VLDate',
        'VLResult', 'SyphilisTreatment', 'HIVStatusBeforeANC',
        'HIVTestingDone', 'HIVTestType', 'HIVTest1', 'HIVTest1Result',
        'HIVTest2', 'HIVTest2Result', 'HIVTestFinalResult',
        'SyphilisTestDone', 'SyphilisTestType', 'SyphilisTestResults',
        'SyphilisTreated', 'MotherProphylaxisGiven', 'MotherGivenHAART',
        'AZTBabyDispense', 'NVPBabyDispense', 'ChronicIllness',
        'CounselledOn', 'PartnerHIVTestingANC', 'PartnerHIVStatusANC',
        'PostParturmFP', 'Deworming', 'MalariaProphylaxis', 'TetanusDose',
        'IronSupplementsGiven', 'ReceivedMosquitoNet', 'PreventiveServices',
        'UrinalysisVariables', 'ReferredFrom', 'ReferredTo',
        'ReferralReasons', 'NextAppointmentANC', 'ClinicalNotes',
        'Date_Last_Modified', 'RecordUUID',
    ),
    # LoadMnchArts.java:85
    'mnch_arts': (
        'PatientPk', 'SiteCode', 'Emr', 'Project', 'Processed', 'QueueId',
        'Status', 'StatusDate', 'DateExtracted', 'PatientMnchID',
        'PatientHeiID', 'FacilityName', 'RegistrationAtCCC', 'StartARTDate',
        'StartRegimen', 'StartRegimenLine', 'StatusAtCCC', 'LastARTDate',
        'LastRegimen', 'LastRegimenLine', 'Date_Created',
        'Date_Last_Modified', 'FacilityReceivingARTCare', 'RecordUUID',
    ),
    # LoadMnchCwcEnrolments.java:86
    'mnch_cwc_enrolments': (
        'PatientIDCWC', 'HEIID', 'PatientPk', 'SiteCode', 'EMR',
        'FacilityName', 'Project', 'DateExtracted', 'PKV', 'MothersPkv',
        'RegistrationAtCWC', 'RegistrationAtHEI', 'VisitID', 'Gestation',
        'BirthWeight', 'BirthLength', 'BirthOrder', 'BirthType',
        'PlaceOfDelivery', 'ModeOfDelivery', 'SpecialNeeds', 'SpecialCare',
        'HEI', 'MotherAlive', 'MothersCCCNo', 'TransferIn', 'TransferInDate',
        'TransferredFrom', 'HEIDate', 'NVP', 'BreastFeeding', 'ReferredFrom',
        'ARTMother', 'ARTRegimenMother', 'ARTStartDateMother', 'Date_Created',
        'Date_Last_Modified', 'RecordUUID',
    ),
    # LoadMnchCwcVisits.java:81
    'mnch_cwc_visits': (
        'PatientMnchID', 'PatientPk', 'SiteCode', 'FacilityName', 'EMR',
        'Project', 'DateExtracted', 'VisitDate', 'VisitID', 'Height',
        'Weight', 'Temp', 'PulseRate', 'RespiratoryRate', 'OxygenSaturation',
        'MUAC', 'WeightCategory', 'Stunted', 'InfantFeeding',
        'MedicationGiven', 'TBAssessment', 'MNPsSupplementation',
        'Immunization', 'DangerSigns', 'Milestones', 'VitaminA', 'Disability',
        'ReceivedMosquitoNet', 'Dewormed', 'ReferredFrom', 'ReferredTo',
        'ReferralReasons', 'FollowUP', 'NextAppointment',
        'Date_Last_Modified', 'ZScore', 'ZScoreAbsolute', 'HeightLength',
        'Refferred', 'RevisitThisYear', 'RecordUUID',
    ),
    # LoadMNCHEnrolments.java:84
    'mnch_enrolments': (
        'PatientMnchID', 'PatientPk', 'SiteCode', 'FacilityName', 'EMR',
        'Project', 'DateExtracted', 'ServiceType', 'EnrollmentDateAtMnch',
        'MnchNumber', 'FirstVisitAnc', 'Parity', 'Gravidae', 'LMP',
        'EDDFromLMP', 'HIVStatusBeforeANC', 'HIVTestDate', 'PartnerHIVStatus',
        'PartnerHIVTestDate', 'BloodGroup', 'StatusAtMnch',
        'Date_Last_Modified', 'RecordUUID',
    ),
    # LoadMNCHHeis.java:82
    'mnch_heis': (
        'PatientPk', 'SiteCode', 'Emr', 'Project', 'Processed', 'QueueId',
        'Status', 'StatusDate', 'FacilityId', 'FacilityName', 'PatientMnchID',
        'DNAPCR1Date', 'DNAPCR2Date', 'DNAPCR3Date', 'ConfirmatoryPCRDate',
        'BasellineVLDate', 'FinalyAntibodyDate', 'DNAPCR1', 'DNAPCR2',
        'DNAPCR3', 'ConfirmatoryPCR', 'BasellineVL', 'FinalyAntibody',
        'HEIExitDate', 'HEIHIVStatus', 'HEIExitCritearia', 'Date_Created',
        'Date_Last_Modified', 'RecordUUID',
    ),
    # LoadMNCHImmunization.java:73
    'mnch_immunization': (
        'Id', 'RefId', 'PatientPk', 'SiteCode', 'Emr', 'Project',
        'DateExtracted', 'FacilityId', 'FacilityName', 'PatientMnchID', 'BCG',
        'OPVatBirth', 'OPV1', 'OPV2', 'OPV3', 'IPV', 'DPTHepBHIB1',
        'DPTHepBHIB2', 'DPTHepBHIB3', 'PCV101', 'PCV102', 'PCV103', 'ROTA1',
        'MeaslesReubella1', 'YellowFever', 'MeaslesReubella2',
        'MeaslesAt6Months', 'ROTA2', 'DateOfNextVisit', 'BCGScarChecked',
        'DateChecked', 'DateBCGrepeated', 'VitaminAAt6Months',
        'VitaminAAt1Yr', 'VitaminAAt18Months', 'VitaminAAt2Years',
        'VitaminAAt2To5Years', 'FullyImmunizedChild', 'RecordUUID',
    ),
    # LoadMnchLabs.java:83
    'mnch_labs': (
        'PatientPk', 'SiteCode', 'Emr', 'Project', 'Processed', 'QueueId',
        'Status', 'StatusDate', 'PatientMNCH_ID', 'FacilityName',
        'SatelliteName', 'VisitID', 'OrderedbyDate', 'ReportedbyDate',
        'TestName', 'TestResult', 'LabReason', 'Date_Last_Modified',
        'RecordUUID',
    ),
    # LoadMnchMatVisits.java:79
    'mnch_mat_visits': (
        'PatientPk', 'SiteCode', 'Emr', 'Project', 'Processed', 'QueueId',
        'Status', 'StatusDate', 'DateExtracted', 'FacilityId',
        'PatientMnchID', 'FacilityName', 'VisitID', 'VisitDate',
        'AdmissionNumber', 'ANCVisits', 'DateOfDelivery',
        'DurationOfDelivery', 'GestationAtBirth', 'ModeOfDelivery',
        'PlacentaComplete', 'UterotonicGiven', 'VaginalExamination',
        'BloodLoss', 'BloodLossVisual', 'ConditonAfterDelivery',
        'MaternalDeath', 'DeliveryComplications', 'NoBabiesDelivered',
        'BabyBirthNumber', 'SexBaby', 'BirthWeight', 'BirthOutcome',
        'BirthWithDeformity', 'TetracyclineGiven', 'InitiatedBF',
        'ApgarScore1', 'ApgarScore5', 'ApgarScore10', 'KangarooCare',
        'ChlorhexidineApplied', 'VitaminKGiven', 'StatusBabyDischarge',
        'MotherDischargeDate', 'SyphilisTestResults', 'HIVStatusLastANC',
        'HIVTestingDone', 'HIVTest1', 'HIV1Results', 'HIVTest2',
        'HIV2Results', 'HIVTestFinalResult', 'OnARTANC',
        'BabyGivenProphylaxis', 'MotherGivenCTX', 'PartnerHIVTestingMAT',
        'PartnerHIVStatusMAT', 'CounselledOn', 'ReferredFrom', 'ReferredTo',
        'ClinicalNotes', 'EDD', 'LMP', 'MaternalDeathAudited', 'OnARTMat',
        'ReferralReason', 'RecordUUID',
    ),
    # LoadMnchMotherBabyPairs.java:84
    'mnch_mother_baby_pairs': (
        'PatientIDCCC', 'PatientPk', 'BabyPatientPK', 'MotherPatientPK',
        'BabyPatientMncHeiID', 'MotherPatientMncHeiID', 'SiteCode',
        'FacilityName', 'EMR', 'Project', 'Date_Last_Modified', 'RecordUUID',
    ),
    # LoadMnchPatients.java:85
    'mnch_patients': (
        'PatientPk', 'SiteCode', 'Emr', 'Project', 'DateExtracted',
        'FacilityName', 'Pkv', 'PatientMnchID', 'PatientHeiID', 'Gender',
        'DOB', 'FirstEnrollmentAtMnch', 'Occupation', 'MaritalStatus',
        'EducationLevel', 'PatientResidentCounty', 'PatientResidentSubCounty',
        'PatientResidentWard', 'InSchool', 'Date_Created',
        'Date_Last_Modified', 'NUPI', 'RecordUUID',
    ),
    # LoadMnchPncVisits.java:81
    'mnch_pnc_visits': (
        'PatientMnchID', 'PatientPk', 'PNCRegisterNumber', 'SiteCode', 'EMR',
        'FacilityName', 'Project', 'DateExtracted', 'VisitID', 'VisitDate',
        'PNCVisitNo', 'DeliveryDate', 'ModeOfDelivery', 'PlaceOfDelivery',
        'Height', 'Weight', 'Temp', 'PulseRate', 'RespiratoryRate',
        'OxygenSaturation', 'MUAC', 'BP', 'BreastExam', 'GeneralCondition',
        'HasPallor', 'Pallor', 'Breast', 'PPH', 'CSScar', 'UterusInvolution',
        'Episiotomy', 'Lochia', 'Fistula', 'MaternalComplications',
        'TBScreening', 'ClientScreenedCACx', 'CACxScreenMethod',
        'CACxScreenResults', 'PriorHIVStatus', 'HIVTestingDone', 'HIVTest1',
        'HIVTest1Result', 'HIVTest2', 'HIVTest2Result', 'HIVTestFinalResult',
        'InfantProphylaxisGiven', 'MotherProphylaxisGiven',
        'CoupleCounselled', 'PartnerHIVTestingPNC', 'PartnerHIVResultPNC',
        'CounselledOnFP', 'ReceivedFP', 'HaematinicsGiven', 'DeliveryOutcome',
        'BabyConditon', 'BabyFeeding', 'UmbilicalCord', 'Immunization',
        'InfantFeeding', 'PreventiveServices', 'ReferredFrom', 'ReferredTo',
        'NextAppointmentPNC', 'ClinicalNotes', 'Date_Last_Modified',
        'InfactCameForHAART', 'MotherCameForHIVTest', 'MotherGivenHAART',
        'VisitTimingBaby', 'VisitTimingMother', 'RecordUUID',
    ),
    # LoadPrepAdverseEvents.java:100
    'prep_adverse_events': (
        'Id', 'RefId', 'Created', 'PatientPk', 'SiteCode', 'Emr', 'Project',
        'Processed', 'QueueId', 'Status', 'StatusDate', 'DateExtracted',
        'FacilityId', 'FacilityName', 'PrepNumber', 'AdverseEvent',
        'AdverseEventStartDate', 'AdverseEventEndDate', 'Severity',
        'VisitDate', 'AdverseEventActionTaken', 'AdverseEventClinicalOutcome',
        'AdverseEventIsPregnant', 'AdverseEventCause', 'AdverseEventRegimen',
        'Date_Created', 'Date_Last_Modified', 'RecordUUID',
    ),
    # LoadPrepBehaviourRisk.java:112
    'prep_behaviour_risk': (
        'RefId', 'Created', 'PatientPk', 'SiteCode', 'Emr', 'Project',
        'Processed', 'QueueId', 'Status', 'StatusDate', 'DateExtracted',
        'FacilityId', 'FacilityName', 'PrepNumber', 'HtsNumber', 'VisitDate',
        'VisitID', 'SexPartnerHIVStatus', 'IsHIVPositivePartnerCurrentonART',
        'IsPartnerHighrisk', 'PartnerARTRisk', 'ClientAssessments',
        'ClientRisk', 'ClientWillingToTakePrep', 'PrEPDeclineReason',
        'RiskReductionEducationOffered', 'ReferralToOtherPrevServices',
        'FirstEstablishPartnerStatus', 'PartnerEnrolledtoCCC',
        'HIVPartnerCCCnumber', 'HIVPartnerARTStartDate',
        'MonthsknownHIVSerodiscordant', 'SexWithoutCondom',
        'NumberofchildrenWithPartner', 'Date_Created', 'Date_Last_Modified',
        'RecordUUID',
    ),
    # LoadPrepCareTermination.java:88
    'prep_care_termination': (
        'ID', 'RefId', 'Created', 'PatientPk', 'SiteCode', 'Emr', 'Project',
        'Processed', 'QueueId', 'Status', 'StatusDate', 'DateExtracted',
        'FacilityId', 'FacilityName', 'PrepNumber', 'HtsNumber', 'ExitDate',
        'ExitReason', 'DateOfLastPrepDose', 'Date_Created',
        'Date_Last_Modified', 'RecordUUID',
    ),
    # LoadPrepLab.java:90
    'prep_lab': (
        'RefId', 'Created', 'PatientPk', 'SiteCode', 'Emr', 'Project',
        'Processed', 'QueueId', 'Status', 'StatusDate', 'DateExtracted',
        'FacilityId', 'FacilityName', 'PrepNumber', 'HtsNumber', 'VisitID',
        'TestName', 'TestResult', 'SampleDate', 'TestResultDate', 'Reason',
        'Date_Created', 'Date_Last_Modified', 'RecordUUID',
    ),
    # LoadPrepPatient.java:143
    'prep_patient': (
        'ID', 'RefId', 'Created', 'PatientPk', 'SiteCode', 'Emr', 'Project',
        'Processed', 'QueueId', 'Status', 'StatusDate', 'DateExtracted',
        'FacilityId', 'FacilityName', 'PrepNumber', 'HtsNumber',
        'PrepEnrollmentDate', 'Sex', 'DateofBirth', 'CountyofBirth', 'County',
        'SubCounty', 'Location', 'LandMark', 'Ward', 'ClientType',
        'ReferralPoint', 'MaritalStatus', 'Inschool', 'PopulationType',
        'KeyPopulationType', 'Refferedfrom', 'TransferIn', 'TransferInDate',
        'TransferFromFacility', 'DatefirstinitiatedinPrepCare',
        'DateStartedPrEPattransferringfacility', 'ClientPreviouslyonPrep',
        'PrevPrepReg', 'DateLastUsedPrev', 'Date_Created',
        'Date_Last_Modified', 'RecordUUID',
    ),
    # LoadPrepPharmacy.java:92
    'prep_pharmacy': (
        'ID', 'RefId', 'Created', 'PatientPk', 'SiteCode', 'Emr', 'Project',
        'Processed', 'QueueId', 'Status', 'StatusDate', 'DateExtracted',
        'FacilityId', 'FacilityName', 'PrepNumber', 'HtsNumber', 'VisitID',
        'RegimenPrescribed', 'DispenseDate', 'Duration', 'Date_Created',
        'Date_Last_Modified', 'RecordUUID',
    ),
    # LoadPrepVisits.java:84
    'prep_visits': (
        'RefId', 'Created', 'PatientPk', 'SiteCode', 'Emr', 'Project',
        'Processed', 'QueueId', 'Status', 'StatusDate', 'DateExtracted',
        'FacilityId', 'FacilityName', 'PrepNumber', 'HtsNumber', 'VisitDate',
        'VisitID', 'BloodPressure', 'Temperature', 'Weight', 'Height', 'BMI',
        'STIScreening', 'STISymptoms', 'STITreated', 'Circumcised',
        'VMMCReferral', 'LMP', 'MenopausalStatus', 'PregnantAtThisVisit',
        'EDD', 'PlanningToGetPregnant', 'PregnancyPlanned', 'PregnancyEnded',
        'PregnancyEndDate', 'PregnancyOutcome', 'BirthDefects',
        'Breastfeeding', 'FamilyPlanningStatus', 'FPMethods', 'AdherenceDone',
        'AdherenceOutcome', 'AdherenceReasons', 'SymptomsAcuteHIV',
        'ContraindicationsPrep', 'PrepTreatmentPlan', 'PrepPrescribed',
        'RegimenPrescribed', 'MonthsPrescribed', 'CondomsIssued',
        'Tobegivennextappointment', 'Reasonfornotgivingnextappointment',
        'HepatitisBPositiveResult', 'HepatitisCPositiveResult',
        'VaccinationForHepBStarted', 'TreatedForHepB',
        'VaccinationForHepCStarted', 'TreatedForHepC', 'NextAppointment',
        'ClinicalNotes', 'Date_Created', 'Date_Last_Modified', 'RecordUUID',
    ),
}
